package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact deduplication — the ingest-side twin of the batch
  * dedup family (`operators/Dedup.scala`): documents stream in, each gets
  * the rolling-hash fingerprint (`operators/TextAnalysis.fingerprint`,
  * the reference's content-hash identity used by the embed queue /
  * MCP store path — deterministic ids from content), and Structured
  * Streaming's stateful `dropDuplicates` keeps the FIRST document per
  * fingerprint across micro-batches. At 100 TB ingest this is the shape
  * that works: state is hash-partitioned by fingerprint in the state
  * store, each micro-batch shuffles only its own rows, nothing global is
  * rebuilt. (A watermark would bound state for unbounded streams; the
  * replayed corpus is finite, so the state here is the distinct set
  * itself — the same deliberate choice as the reference's in-memory
  * content-hash registry.)
  */
object StreamDedup {

  /** Drive the documents parquet through a streaming dedup and return
    * (n_docs, n_unique, n_dupes) — total streamed, first-seen kept, and
    * duplicates dropped. Deterministic: counts don't depend on which
    * micro-batch saw a fingerprint first.
    */
  def dedupStats(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val stream = graft.Tables.documentsStreaming(spark, sfDir)
    val fingered = stream.select(col("doc_id"),
      graft.operators.TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))
    val q = fingered
      .dropDuplicates("fingerprint")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    val unique = spark.table(queryName)
    val total = graft.Tables.documents(spark, sfDir).count()
    val kept = unique.count()
    import spark.implicits._
    Seq((total, kept, total - kept)).toDF("n_docs", "n_unique", "n_dupes")
  }
}
