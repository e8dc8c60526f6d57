package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphStore
import graft.operators.Chunker

/** The reference's background embedding worker
  * (`/root/reference/pkg/nornicdb/embed_queue.go`): dirty nodes are
  * dequeued, their text chunked (`chunkText`, :509), each chunk embedded
  * (`EmbedBatch`, :512), and ALL chunk vectors stored on the node
  * (`ChunkEmbeddings`, :530) with granular `<id>-chunk-<i>` index entries
  * (`pkg/search/search.go:687`). Re-expressed Spark-first: a Structured
  * Streaming read of the document source → the exact chunk splitter →
  * the disclosed TextEmbed projection (stand-in for `pkg/embed` under
  * zero egress) → a `foreachBatch` upsert into the store's named
  * node-embedding table. At 100 TB the foreachBatch body is a
  * Delta-MERGE keyed on (entity_id, name); chunking and projection are
  * one generated-code pass with no shuffle before the upsert.
  */
object EmbedQueue {

  /** Drive the documents parquet through a real streaming query,
    * upserting every micro-batch's chunk embeddings into `store` under
    * `embName`. Returns after the stream drains.
    */
  def streamingChunkEmbed(spark: SparkSession, sfDir: String,
      store: GraphStore, size: Int, overlap: Int,
      embName: String = "content"): Unit = {
    val batchSchema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(batchSchema)
      .option("basePath", sfDir)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val embedder = graft.functions.Embedder.current
        val chunks = Chunker.chunkDocs(batch, "text", "doc_id", size, overlap)
        store.setNodeVectorProperties(chunks.select(
          col("chunk_id").as("entity_id"),
          lit(embName).as("name"),
          embedder.embedCol(batch.sparkSession, col("chunk")).as("embedding")))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
