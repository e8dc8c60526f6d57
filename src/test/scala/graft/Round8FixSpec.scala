package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algorithms
import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Round-8 structural fixes from the round-7 verdict: one-action path
  * reconstruction in weightedPath (#7) and distributed batch numbering in
  * CALL {} IN TRANSACTIONS (#6).
  */
class Round8FixSpec extends AnyFunSuite {
  import TestSpark._

  /** Run `body` under a job group and return the number of Spark jobs it
    * submitted (polls the listener-fed status store until stable).
    */
  private def jobsIn(group: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    var last = -1
    var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    var i = 0
    while (cur != last && i < 50) {
      Thread.sleep(100)
      last = cur
      cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      i += 1
    }
    cur
  }

  test("weightedPath job count is independent of path length (1-action reconstruction)") {
    import spark.implicits._
    val n = 10
    val nodes = (0 until n).map(i => s"n$i").toDF("id")
    val edges = (0 until n - 1).map(i => (s"n$i", s"n${i + 1}", 1.0))
      .toDF("src", "dst", "weight")
    val g = PropertyGraph(nodes, edges)
    Algorithms.weightedPath(g, "n0", "n2", n - 1) // warm-up (parquet-free, codegen)
    val near = jobsIn("wp-near") {
      val r = Algorithms.weightedPath(g, "n0", "n2", n - 1).get
      assert(r._1 == Seq("n0", "n1", "n2") && r._2 == 2.0)
    }
    val far = jobsIn("wp-far") {
      val r = Algorithms.weightedPath(g, "n0", s"n${n - 1}", n - 1).get
      assert(r._1 == (0 until n).map(i => s"n$i") && r._2 == (n - 1).toDouble)
    }
    // the relaxation rounds are identical in both calls (the frontier
    // explores the same graph); the old per-hop parent-chain walk added
    // one driver lookup job per extra hop — 7 more for the far target
    assert(far == near, s"reconstruction submitted extra per-hop jobs: near=$near far=$far")
    // unreachable target still → None through the array-path variant
    assert(Algorithms.weightedPath(g, "n5", "n0", n).isEmpty)
  }

  test("multimodal: real ImageIO PNG decode reproduces the pattern pixel stats") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sf).limit(8)
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.withImagePayload(docs)).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        val (w, h) = Multimodal.patternDims(id)
        assert(r.getString(1) == "png" && r.getInt(3) == w &&
          r.getInt(4) == h && r.getInt(5) == 1)
        val exp = (for { y <- 0 until h; x <- 0 until w }
          yield Multimodal.patternPixel(id, x, y).toLong).sum.toDouble / (w * h)
        assert(r.getDouble(6) == exp, s"decoded avg_luma drifted for doc $id")
      } else {
        assert(r.getString(1) == "bin" && r.getInt(3) == -1 && r.getDouble(6) == -1.0)
      }
    }
    // JPEG sniff + decode path (lossy → dims/channels only)
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    import spark.implicits._
    val one = Seq((99L, bos.toByteArray)).toDF("doc_id", "payload")
    val jr = Multimodal.decodeImageFeatures(one).collect().head
    assert(jr.getString(1) == "jpeg" && jr.getInt(3) == 5 && jr.getInt(4) == 4 &&
      jr.getInt(5) == 3)
  }

  test("IN TRANSACTIONS updates every row with per-row values across range partitions") {
    val store = new GraphStore(GraphQueries.graph(spark, sf))
    CypherWrite.execute(store,
      s"UNWIND [${(1 to 25).mkString(", ")}] AS k CREATE (p:Person {key: k, name: 'P'})")
    CypherWrite.execute(store,
      """MATCH (p:Person)
         CALL { WITH p SET p.acctbal = p.key * 2 } IN TRANSACTIONS OF 4 ROWS""")
    val rows = Cypher.run(store.snapshot,
      "MATCH (p:Person) RETURN p.key AS k, p.acctbal AS b")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows.size == 25)
    assert((1 to 25).forall(k => rows(k.toLong) == k * 2.0),
      s"batch numbering dropped or duplicated rows: $rows")
  }
}
