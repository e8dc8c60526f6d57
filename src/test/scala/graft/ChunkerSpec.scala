package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChunkImpls, Chunker}

/** Document chunking (embed_queue.go:856 port) + chunk-level search. */
class ChunkerSpec extends AnyFunSuite {
  import TestSpark._

  test("chunkText: single window early-returns whole text") {
    assert(ChunkImpls.chunkText("short text", 128, 16).toSeq == Seq("short text"))
    assert(ChunkImpls.chunkText("x" * 128, 128, 16).toSeq == Seq("x" * 128))
  }

  test("chunkText: boundary preference and overlap stepping") {
    // sentence break past the midpoint wins over the word break
    val t = ("a" * 70) + ". " + ("b" * 100)
    val cs = ChunkImpls.chunkText(t, 128, 16)
    assert(cs(0) == ("a" * 70) + ".") // end = sent + 1 keeps the period
    // paragraph break beats sentence break
    val p = ("a" * 60) + ". " + ("c" * 8) + "\n\n" + ("b" * 100)
    assert(ChunkImpls.chunkText(p, 128, 16)(0) == ("a" * 60) + ". " + ("c" * 8))
    // no boundary past midpoint → hard cut at size
    val h = "z" * 300
    assert(ChunkImpls.chunkText(h, 128, 16)(0).length == 128)
  }

  test("chunkText: faithful tail-overlap quirk and full coverage") {
    val words = (1 to 80).map(i => s"w$i").mkString(" ") // ~ 400 chars
    val cs = ChunkImpls.chunkText(words, 128, 16)
    assert(cs.length > 2)
    // Go's loop re-emits the last `overlap` chars as a short tail chunk
    assert(cs.last.length <= 16)
    // every chunk is a substring at increasing positions and the final
    // chunk reaches the end of the text
    var from = 0
    cs.foreach { c =>
      val at = words.indexOf(c, from)
      assert(at >= 0, s"chunk not found in order: '$c'")
      from = at
    }
    assert(words.endsWith(cs.last))
  }

  test("chunkDocs explodes with reference chunk ids; expression matches port") {
    val docs = Tables.documents(spark, sf)
    val got = Chunker.chunkDocs(docs, "text", "doc_id", 128, 16)
    val byDoc = got.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ChunkImpls.chunkText(r.getString(1), 128, 16).length.toLong)
      .toMap
    assert(byDoc == expected)
    val row = got.filter(col("chunk_idx") === 1).limit(1).collect()(0)
    assert(row.getAs[String]("chunk_id") == s"${row.getAs[Long]("doc_id")}-chunk-1")
  }

  test("embed queue: streaming upsert is idempotent on (entity_id, name)") {
    val g = GraphQueries.graph(spark, sf)
    val store = new graft.graph.GraphStore(
      graft.graph.PropertyGraph(g.nodes.filter("false"), g.edges.filter("false")),
      registerGlobal = false)
    graft.streaming.EmbedQueue.streamingChunkEmbed(spark, sf, store, 128, 16)
    val n1 = store.nodeEmbeddings.count()
    assert(n1 > 0)
    // a re-run overwrites the same keys (Delta-MERGE shape), no duplicates
    graft.streaming.EmbedQueue.streamingChunkEmbed(spark, sf, store, 128, 16)
    assert(store.nodeEmbeddings.count() == n1)
    assert(store.nodeEmbeddings
      .groupBy("entity_id", "name").count().filter(col("count") > 1).count() == 0)
  }

  test("searchChunks: k best docs, one chunk each, scores in [-1, 1] desc") {
    val res = Chunker.searchChunks(Tables.documents(spark, sf),
      "fast table scan merge", 10, 128, 16).collect()
    assert(res.length == 10)
    assert(res.map(_.getAs[Long]("doc_id")).distinct.length == 10)
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    scores.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }
}
