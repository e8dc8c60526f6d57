package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression tests for the round-6 advisor findings: the reference's
  * soundex variant (prevCode resets on ANY unmapped char, text.go:610),
  * the Mmr all-NaN guard (search.go:1616-1622 breaks on bestIdx < 0), and
  * Audit pagination requiring explicit sort keys.
  */
class Round7AdviceSpec extends AnyFunSuite {
  import TestSpark._

  test("reference soundex diverges from ANSI on H/W-separated consonants") {
    graft.functions.HashExprs.ensure(spark)
    val r = spark.sql(
      """SELECT graft_soundex('Ashcraft') AS a, soundex('Ashcraft') AS std,
                graft_soundex('Smith') AS s, graft_soundex('Smythe') AS sy,
                graft_soundex('') AS e, graft_soundex('Tymczak') AS t"""
    ).head()
    // reference loop: A, S(2)... H resets prevCode=0, C→2 emitted again
    assert(r.getString(0) == "A226")       // reference behavior
    assert(r.getString(1) == "A261")       // Spark's ANSI soundex differs
    assert(r.getString(2) == "S530" && r.getString(3) == "S530")
    assert(r.getString(4) == "")
    assert(r.getString(5) == "T522")       // vowel reset: m,cz,k all coded
  }

  test("apoc.text.phonetic/phoneticDelta/doubleMetaphone use the reference soundex") {
    val g = GraphQueries.graph(spark, sf)
    val df = graft.cypher.Cypher.run(g,
      """RETURN apoc.text.phonetic('Ashcraft') AS ph,
                apoc.text.phoneticDelta('Ashcraft', 'Ashcroft') AS pd,
                apoc.text.doubleMetaphone('Ashcraft') AS dm""")
    val r = df.head()
    assert(r.getString(0) == "A226")
    assert(r.getInt(1) == 0)
    assert(r.getSeq[String](2) == Seq("A226"))
  }

  test("Mmr.select stops gracefully when every remaining score is NaN") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rel", DoubleType, false),
      StructField("embedding", ArrayType(DoubleType), true)))
    val rows = Seq(
      Row(1L, Double.NaN, Array(1.0, 0.0)),
      Row(2L, Double.NaN, Array(0.0, 1.0)))
    val cands = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    // all-NaN rel → every MMR score NaN → bestIdx stays -1 → empty result,
    // not an IndexOutOfBounds from cands.remove(-1)
    assert(graft.search.Mmr.select(cands, limit = 2, lambda = 0.5).count() == 0L)
  }

  test("Audit.paginate requires sort keys and pages deterministically") {
    import spark.implicits._
    val log = Seq(
      ("e1", "2024-01-01 00:00:00", "DATA_READ", "7", "r1", true),
      ("e2", "2024-01-02 00:00:00", "DATA_READ", "7", "r2", true),
      ("e3", "2024-01-03 00:00:00", "DATA_READ", "7", "r3", true))
      .toDF("event_id", "ts", "event_type", "user_id", "resource_id", "success")
      .withColumn("ts", col("ts").cast("timestamp"))
    val filtered = graft.operators.Audit.query(log, userId = Some("7"))
    val page = graft.operators.Audit.paginate(filtered,
      Seq("ts", "event_id"), offset = 1, limit = 1)
    assert(page.select("event_id").as[String].collect().toSeq == Seq("e2"))
    intercept[IllegalArgumentException] {
      graft.operators.Audit.paginate(filtered, Nil, 0, 10)
    }
  }
}
