package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Cypher
import graft.functions.{Embedder, TextEmbed}
import graft.graph.{GraphStore, PropertyGraph}
import graft.search.SearchIndexes

/** The pluggable Embedder seam: a fake encoder injected via
  * `Embedder.withEmbedder` flows end-to-end through (1) the text-query
  * vector CALL surface, (2) `Chunker.searchChunks`, and (3) the streaming
  * embed queue — with no call-site edits, and the default restored after.
  * (The reference wires its encoder once behind `pkg/embed`'s interface;
  * this is that seam.)
  */
class EmbedderSeamSpec extends AnyFunSuite {
  import TestSpark._

  /** Constant-direction fake: every text embeds to [1, 0]. Any search
    * scored with it returns cosine exactly 1.0 against [1, 0] vectors —
    * unmistakably not the hash projection.
    */
  private object ConstantEmbedder extends Embedder {
    val dim = 2
    def embed(text: String): Seq[Double] = Seq(1.0, 0.0)
    def embedCol(spark: SparkSession, c: Column): Column =
      array(lit(1.0), lit(0.0))
  }

  test("default embedder is the disclosed hash projection") {
    assert(Embedder.current eq Embedder.HashProjection)
    assert(Embedder.current.embed("quick brown fox") ==
      TextEmbed.embed("quick brown fox"))
  }

  test("text-query vector CALL resolves the injected embedder") {
    import spark.implicits._
    val vecs = Seq(
      ("along", Seq(1.0, 0.0)),   // aligned with the fake's direction
      ("ortho", Seq(0.0, 1.0)),
      ("diag", Seq(0.7071067811865476, 0.7071067811865476)))
      .toDF("vid", "embedding")
    SearchIndexes.registerVector(SearchIndexes.VectorIdx(
      "seam_idx", () => vecs, "vid", "embedding", "DATASET"))
    val g = GraphQueries.graph(spark, sf)
    val got = Embedder.withEmbedder(ConstantEmbedder) {
      Cypher.run(g,
        """CALL db.index.vector.queryNodes('seam_idx', 3, 'any text at all')
           YIELD node, score RETURN node, score ORDER BY score DESC""")
        .collect().toSeq
    }
    // the fake's [1,0] query ranks 'along' first at cosine exactly 1.0
    assert(got.head.getString(0) == "along")
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-12)
    assert(got.map(_.getString(0)) == Seq("along", "diag", "ortho"))
    // seam restored
    assert(Embedder.current eq Embedder.HashProjection)
  }

  test("searchChunks embeds chunks and query through the injected embedder") {
    val docs = Tables.documents(spark, sf).limit(8)
    val got = Embedder.withEmbedder(ConstantEmbedder) {
      graft.operators.Chunker.searchChunks(docs, "whatever", 5, 128, 16)
        .collect()
    }
    // constant embeddings → every best-chunk score is cosine 1.0 exactly;
    // the hash projection would produce varied scores
    assert(got.nonEmpty)
    got.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-9))
  }

  test("rerank resolves the injected cross-encoder seam") {
    import spark.implicits._
    import graft.search.Rerank
    val cands = Seq((1L, "alpha beta", 0.9), (2L, "gamma", 0.8))
      .toDF("id", "content", "bi_score")
    // a fake cross-encoder that inverts the bi order
    val inverted: Rerank.Encoder = (df, _) =>
      df.withColumn("cross_score", org.apache.spark.sql.functions.lit(1.0) -
        org.apache.spark.sql.functions.col("bi_score"))
    val got = Rerank.withEncoder(inverted) {
      Rerank.rerank(cands, "whatever").collect()
    }
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L)) // inverted order
    // default restored: lexical overlap ranks the query-matching doc first
    val dflt = Rerank.rerank(cands, "alpha beta").collect()
    assert(dflt.head.getLong(0) == 1L)
  }

  test("ProcessEmbedder speaks the line protocol to a real external process and reuses it") {
    import graft.functions.ProcessEmbedder
    // deterministic model stand-in: vec = [len(text), ord(first), pid] —
    // the pid component proves the process is spawned ONCE per JVM and
    // reused across requests (the llama.cpp lifecycle, pkg/localllm)
    val script = java.nio.file.Files.createTempFile("embedder", ".py")
    java.nio.file.Files.writeString(script,
      """import sys, json, os
        |pid = float(os.getpid() % 100000)
        |for line in sys.stdin:
        |    t = json.loads(line)
        |    print(json.dumps([float(len(t)), float(ord(t[0])) if t else 0.0, pid]))
        |    sys.stdout.flush()
        |""".stripMargin)
    val cmd = Seq("python3", script.toString)
    val pe = new ProcessEmbedder(cmd, dim = 3)
    try {
      val v1 = pe.embed("hello")
      assert(v1.take(2) == Seq(5.0, 104.0))
      val v2 = pe.embed("graft \"quoted\"\nline")
      assert(v2.head == 19.0 && v2(1) == 103.0) // JSON round-trip survives quotes/newlines
      assert(v1(2) == v2(2), "process was respawned between requests")
      // distributed column form: one process per executor JVM, reused per row
      import spark.implicits._
      val rows = Seq("a", "bb", "ccc").toDF("text")
        .withColumn("vec", pe.embedCol(spark, col("text")))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1))
      rows.foreach { case (t, v) =>
        assert(v.head == t.length.toDouble && v(1) == t.head.toInt.toDouble)
      }
      assert(rows.map(_._2(2)).distinct.size == 1, "each row spawned its own process")
      // dimension contract enforced
      intercept[IllegalArgumentException] {
        new ProcessEmbedder(cmd, dim = 7).embed("x")
      }
      // flows through the seam like any other provider
      Embedder.withEmbedder(pe) {
        assert(Embedder.current.embed("seam")(0) == 4.0)
      }
    } finally {
      ProcessEmbedder.shutdown(cmd)
      java.nio.file.Files.deleteIfExists(script)
    }
  }

  test("streaming embed queue writes the injected embedder's vectors") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    Embedder.withEmbedder(ConstantEmbedder) {
      graft.streaming.EmbedQueue.streamingChunkEmbed(spark, sf, store, 128, 16)
    }
    val embs = store.nodeEmbeddings.select("embedding").limit(5)
      .collect().map(_.getSeq[Double](0))
    assert(embs.nonEmpty)
    embs.foreach(v => assert(v == Seq(1.0, 0.0)))
  }
}
