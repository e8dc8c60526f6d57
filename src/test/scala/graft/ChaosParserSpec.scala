package graft


import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Ast, ExplainCypher, Parser}

/** Chaos-style parser tests — the reference needs a 1938-line chaos suite
  * because it routes raw strings by keyword matching
  * (`/root/reference/pkg/cypher/chaos_injection_test.go`); a real
  * lexer/parser handles these structurally.
  */
class ChaosParserSpec extends AnyFunSuite {

  private def parses(q: String): Ast.Query = Parser.parse(q)
  private def failsCleanly(q: String): Unit = {
    val e = intercept[IllegalArgumentException](Parser.parse(q))
    assert(e.getMessage.contains("parse error") || e.getMessage.contains("unterminated")
      || e.getMessage.contains("unexpected"))
  }

  test("keywords inside string literals are data, not syntax") {
    val q = parses("MATCH (n) WHERE n.name = 'MATCH (x) DETACH DELETE x RETURN' RETURN n.name AS v")
    val where = q.parts.head.clauses.collect { case m: Ast.MatchClause => m.where }.flatten
    assert(where.exists {
      case Ast.Bin("=", _, Ast.Lit(s: String)) => s.contains("DETACH DELETE")
      case _ => false
    })
  }

  test("labels and aliases that collide with keywords keep their spelling") {
    val q = parses("MATCH (o:Order)-[:In]->(c:Count) RETURN o.key AS `order`, c.key AS count")
    val m = q.parts.head.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(m.paths.head.first.label.contains("Order"))
    assert(m.paths.head.hops.head._2.label.contains("Count"))
  }

  test("pathological whitespace and comments are ignored") {
    parses("MATCH\n\t( n :Customer )//c\n WHERE/* x */n.acctbal>0\nRETURN n.name AS nm")
  }

  test("deep parenthesization and operator precedence") {
    val q = parses("MATCH (n) WHERE ((n.a > 1 AND n.b < 2) OR NOT (n.c = 3)) AND n.d IN [1,2,3] RETURN n")
    assert(q.parts.head.clauses.nonEmpty)
  }

  test("unterminated string, unbalanced parens, trailing garbage all fail cleanly") {
    failsCleanly("MATCH (n:Customer RETURN n")
    failsCleanly("MATCH (n) WHERE n.x = 'oops RETURN n")
    failsCleanly("MATCH (n) RETURN n.x AS v ; DROP TABLE lineitem")
  }

  test("numeric literal edge cases: floats, exponents, range operator") {
    parses("MATCH (n) WHERE n.x > 1.5e-3 RETURN n.x AS v")
    parses("MATCH (a)-[*1..3]->(b) RETURN count(b) AS n")
    parses("UNWIND range(1, 10) AS i RETURN i")
  }

  test("round-2 syntax parses structurally: CALL YIELD, COUNT{}, shortestPath, hints, XOR") {
    val cp = parses("CALL db.labels() YIELD label AS l, n_nodes WHERE n_nodes > 0 RETURN l")
      .parts.head.clauses.head.asInstanceOf[Ast.CallProc]
    assert(cp.name == "db.labels" && cp.yields == Seq(("label", Some("l")), ("n_nodes", None))
      && cp.where.isDefined)

    val cnt = parses("MATCH (n) WHERE COUNT { (n)-[:T]->(m) WHERE m.x > 1 } > 2 RETURN n")
      .parts.head.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(cnt.where.exists {
      case Ast.Bin(">", Ast.CountPattern(_, Some(_)), Ast.Lit(2L)) => true
      case _ => false
    })

    val sp = parses("MATCH p = allShortestPaths((a:X)-[:R|S*..3]->(b:Y)) RETURN length(p) AS l")
      .parts.head.clauses.head.asInstanceOf[Ast.MatchClause].paths.head
    assert(sp.pathVar.contains("p") && sp.shortest.contains("all")
      && sp.hops.head._1.altTypes == Seq("S") && sp.hops.head._1.varLength.contains((1, 3)))

    val hinted = parses("MATCH (n:L) USING INDEX n:L(p) USING SCAN m:K WHERE n.p = 1 RETURN n")
      .parts.head.clauses.head.asInstanceOf[Ast.MatchClause]
    assert(hinted.hints == Seq("INDEX n:L(p)", "SCAN m:K"))

    // keyword-colliding content still safe with the new keywords
    parses("MATCH (n) WHERE n.name = 'CALL db.labels() YIELD label' RETURN n.name AS v")
    parses("MATCH (n) WHERE n.name CONTAINS 'XOR' RETURN n")

    val tx = parses("MATCH (p:X) CALL { WITH p SET p.a = 1 } IN TRANSACTIONS OF 50 ROWS")
      .parts.head.clauses(1).asInstanceOf[Ast.CallSubquery]
    assert(tx.inTransactionsOf.contains(50L))
  }

  test("EXPLAIN operator mapping is stable") {
    val ops = ExplainCypher.operators(
      "MATCH (c:Customer) WHERE c.acctbal > 0 RETURN DISTINCT c.mktsegment AS s ORDER BY s LIMIT 3")
    assert(ops == Seq("NodeByLabelScan(:Customer)", "Filter", "Projection",
      "Distinct", "Sort", "Limit", "ProduceResults"))
  }
}

/** Same chaos discipline for the GraphQL mini-parser: every truncation
  * and random single-char mutation of valid documents must parse or
  * throw promptly — never hang, never stack-overflow.
  */
class GraphQlChaosSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val server = {
    val store = new graft.graph.GraphStore(
      GraphQueries.graph(spark, sf), registerGlobal = false)
    new graft.sources.GraphQlServer(store) // never started — parser only
  }

  private val docs = Seq(
    """query N($id: ID! = "x") { node(id: $id) { id labels properties } }""",
    "fragment F on Node { id labels } query { node(id: \"a\") { ...F ... on Node { id } } }",
    """mutation M($in: CreateNodeInput!) { createNode(input: $in) { id } }""",
    """query { search(query: "a b", options: {limit: 5, labels: ["X"], method: HYBRID}) { results { node { id } score } totalCount } }""",
    "query { a: labels b: relationshipTypes stats { nodeCount labels { label count } } }")

  test("valid documents parse") {
    docs.foreach(d => assert(server.parseOnly(d) >= 1))
  }

  test("every truncation parses or throws promptly") {
    docs.foreach { d =>
      (0 until d.length).foreach { i =>
        try server.parseOnly(d.substring(0, i))
        catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => }
      }
    }
  }

  test("seeded single-char mutations parse or throw promptly") {
    val rnd = new scala.util.Random(42)
    val chars = "{}()[]:$\"\\,.@#! abcdef0123"
    docs.foreach { d =>
      (1 to 200).foreach { _ =>
        val i = rnd.nextInt(d.length)
        val m = d.substring(0, i) + chars(rnd.nextInt(chars.length)) + d.substring(i + 1)
        try server.parseOnly(m)
        catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException |
                     _: NumberFormatException => }
      }
    }
  }
}

class EvalQualitySpec extends AnyFunSuite {
  import TestSpark._

  test("ANN IR metrics are in range and recall reflects the LSH tuning") {
    val row = graft.search.Eval
      .annVsBrute(spark, Tables.embeddings(spark, sf), 10, 10, 4, 8)
      .collect()(0)
    val (p, r, mrr, ndcg) = (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    Seq(p, r, mrr, ndcg).foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(r >= 0.4, s"macro recall@10 = $r") // 4 bits × 8 tables on this corpus
    assert(ndcg >= r * 0.8)
  }
}
