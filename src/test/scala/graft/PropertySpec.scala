package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Ast, Lexer, Parser}
import graft.functions.KalmanFilter

/** ScalaCheck property layer (SURVEY §5: expression/agg laws — the
  * reference has no property-based tests at all).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val stringLitGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '(', ')', '=', '>',
      'M', 'A', 'T', 'C', 'H'))).map(_.mkString)

  test("XOR over literal booleans follows the truth table for any operand pair") {
    // parser + compiler level: a XOR b === (a != b) for non-null booleans
    check(Prop.forAll(Gen.oneOf(true, false), Gen.oneOf(true, false)) { (a, b) =>
      val q = Parser.parse(s"RETURN ($a) XOR ($b) AS v")
      q.parts.head.clauses.head match {
        case Ast.ReturnClause(items, _, _, _, _) =>
          items.head.expr == Ast.Bin("XOR", Ast.Lit(a), Ast.Lit(b))
        case _ => false
      }
    })
  }

  test("DISTINCT aggregate laws: engine sum/avg(DISTINCT) equals Scala over distinct values") {
    import TestSpark._
    import graft.cypher.Cypher
    val g = GraphQueries.graph(spark, sf)
    // deterministic sample of small long lists (each case is a Spark job —
    // keep the count modest)
    val lists = Seq(
      Seq(1L, 1L, 2L), Seq(5L), Seq(3L, 3L, 3L), Seq(2L, 4L, 4L, 8L),
      Seq(7L, 1L, 7L, 1L, 9L), Seq(10L, 10L), Seq(0L, 0L, 1L))
    lists.foreach { xs =>
      val lit = xs.mkString("[", ", ", "]")
      val row = Cypher.run(g,
        s"UNWIND $lit AS x RETURN sum(DISTINCT x) AS s, avg(DISTINCT x) AS a, count(DISTINCT x) AS c")
        .collect().head
      val d = xs.distinct
      assert(row.getLong(0) == d.sum, s"sum(DISTINCT) on $xs")
      assert(math.abs(row.getDouble(1) - d.sum.toDouble / d.size) < 1e-12, s"avg(DISTINCT) on $xs")
      assert(row.getLong(2) == d.size.toLong, s"count(DISTINCT) on $xs")
    }
  }

  test("any identifier round-trips as variable and property name") {
    check(Prop.forAll(identGen, identGen) { (v, p) =>
      val q = Parser.parse(s"MATCH ($v) RETURN $v.$p AS x")
      q.parts.head.clauses.exists {
        case Ast.ReturnClause(items, _, _, _, _) =>
          items.head.expr == Ast.Prop(v, p)
        case _ => false
      }
    })
  }

  test("any string literal content survives lexing as data (injection-proof)") {
    check(Prop.forAll(stringLitGen) { s =>
      val escaped = s.replace("\\", "\\\\").replace("'", "\\'")
      val toks = Lexer.tokenize(s"RETURN '$escaped' AS v")
      toks.collect { case Lexer.StrLit(t) => t } == Vector(s)
    })
  }

  test("integer literals: lexer/parser agree with Scala parsing") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { n =>
      val q = Parser.parse(s"RETURN $n AS v")
      q.parts.head.clauses.head match {
        case Ast.ReturnClause(items, _, _, _, _) => items.head.expr == Ast.Lit(n)
        case _ => false
      }
    })
  }

  test("kalman filter: constant series converges to the constant; ordering of convergence") {
    check(Prop.forAll(Gen.choose(-1000.0, 1000.0), Gen.choose(5, 60)) { (c, n) =>
      val est = KalmanFilter.filterSeriesScala(Seq.fill(n)(c), 0.01, 1.0)
      math.abs(est - c) < 1e-6
    })
  }

  test("kalman estimate is bounded by the series envelope") {
    val seriesGen = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
    check(Prop.forAll(seriesGen) { zs =>
      val est = KalmanFilter.filterSeriesScala(zs, 0.01, 1.0)
      est >= zs.min - 1e-9 && est <= zs.max + 1e-9
    })
  }

  test("minhash property: identical shingle sets give identical signatures (hash determinism)") {
    check(Prop.forAll(Gen.listOfN(8, identGen)) { words =>
      // murmur3-based signature determinism mirrors Dedup.minhashLshPairs
      def sig(ws: Seq[String]): Seq[Int] =
        (0 until 4).map(seed => ws.map(w =>
          scala.util.hashing.MurmurHash3.stringHash(w, seed)).min)
      words.isEmpty || sig(words) == sig(words.reverse.reverse)
    })
  }

  test("protobuf wire codec round-trips every field kind and frame") {
    import graft.sources.Protobuf
    val varintGen = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    check(Prop.forAll(varintGen, Gen.chooseNum(1, 500000),
      Gen.asciiPrintableStr, Gen.listOfN(7, Gen.chooseNum(-1e6f, 1e6f)),
      Gen.chooseNum(-1e12, 1e12)) { (v, no, s, fs, d) =>
      val w = Protobuf.w()
        .uint(no, v).str(no + 1, s).packedFloats(no + 2, fs)
        .double(no + 3, d).float(no + 4, fs.headOption.getOrElse(0f))
        .msg(no + 5, Protobuf.w().uint(1, 42).bool(2, true))
      val back = Protobuf.fields(w.bytes)
      val nested = Protobuf.find(back, no + 5).get.msg
      Protobuf.find(back, no).get.num == v &&
        Protobuf.find(back, no + 1).get.str == s &&
        Protobuf.find(back, no + 2).get.floats == fs &&
        Protobuf.find(back, no + 3).get.doubleVal == d &&
        Protobuf.find(nested, 1).get.num == 42L &&
        Protobuf.find(nested, 2).get.num == 1L
    })
    // gRPC frames round-trip in sequence, flags preserved
    check(Prop.forAll(Gen.listOf(Gen.zip(Gen.oneOf(0, 0x80),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))))) { frames =>
      val body = frames.flatMap { case (fl, bs) =>
        Protobuf.grpcFrame(fl, bs.toArray).toSeq }.toArray
      val back = Protobuf.grpcFrames(body)
      back.map(_._1) == frames.map(_._1) &&
        back.map(_._2.toSeq) == frames.map(_._2)
    })
  }
}
