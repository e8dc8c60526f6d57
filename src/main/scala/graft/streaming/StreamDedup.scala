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

  /** Streaming MinHash-LSH NEAR-duplicate detection — dedup-on-ingest for
    * the training-data pipeline: each micro-batch's documents are banded
    * ([[graft.operators.Dedup.minhashBands]], md5 oracle tier), candidates
    * come from the band equi-join against the ACCUMULATED state (plus the
    * within-batch self-join), and a candidate pair is a duplicate when its
    * signatures agree on ≥ `simThreshold·nHashes` components (the MinHash
    * Jaccard estimate — state holds one compact signature per doc, never
    * the corpus's shingle sets).
    *
    * Order-independent by construction: every colliding pair flags its
    * LARGER doc_id, whichever side arrives first, so the verdict set —
    * and the DuckDB oracle replaying it batch-wise — does not depend on
    * micro-batch boundaries or arrival order. At 100 TB the state table
    * is hash-bucketed by (band, bsig) — the same shape as the batch
    * tier's banding join, fed incrementally.
    */
  def nearDupStats(spark: SparkSession, sfDir: String,
      shingleN: Int = 3, nHashes: Int = 16, nBands: Int = 4,
      simThreshold: Double = 0.5): DataFrame =
    nearDupOver(spark, graft.Tables.documentsStreaming(spark, sfDir),
      graft.Tables.documents(spark, sfDir).count(),
      shingleN, nHashes, nBands, simThreshold)

  /** The streaming body over an arbitrary documents stream (the spec
    * drives a multi-file source at maxFilesPerTrigger=1 through here to
    * exercise the cross-batch state join).
    */
  def nearDupOver(spark: SparkSession, stream: DataFrame, totalDocs: Long,
      shingleN: Int = 3, nHashes: Int = 16, nBands: Int = 4,
      simThreshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.Column
    val matchFloor = math.ceil(simThreshold * nHashes).toInt
    def sigAgree(a: Column, b: Column): Column =
      (0 until nHashes).map(i =>
        when(element_at(a, i + 1) === element_at(b, i + 1), 1).otherwise(0))
        .reduce(_ + _)
    // accumulated band/signature state + flagged duplicate ids; both
    // bounded: state is one row per (doc, band), dups a fraction of docs
    var state: DataFrame = null
    var dupIds: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))

    // typed val: foreachBatch has a Java overload the bare lambda can
    // resolve to ambiguously
    val perBatch: (DataFrame, Long) => Unit = (batch: DataFrame, _: Long) => {
        val bb = graft.operators.Dedup
          .minhashBands(batch, shingleN, nHashes, nBands)
          .coalesce(4).localCheckpoint(true)
        val n = bb.select(col("doc_id").as("a"), col("band"),
          col("bsig"), col("sig").as("sig_a"))
        // vs accumulated state: flag the larger id of every matching pair
        val vsState = Option(state).map { st =>
          n.join(st.select(col("doc_id").as("b"), col("band"),
              col("bsig"), col("sig").as("sig_b")), Seq("band", "bsig"))
            .filter(col("a") =!= col("b") &&
              sigAgree(col("sig_a"), col("sig_b")) >= matchFloor)
            .select(greatest(col("a"), col("b")).as("doc_id"))
        }
        // within this batch (state not yet updated — no double count)
        val within = n.join(bb.select(col("doc_id").as("b"), col("band"),
            col("bsig"), col("sig").as("sig_b")), Seq("band", "bsig"))
          .filter(col("a") < col("b") &&
            sigAgree(col("sig_a"), col("sig_b")) >= matchFloor)
          .select(col("b").as("doc_id"))
        val flagged = vsState.map(_.unionByName(within)).getOrElse(within)
          .distinct()
        dupIds = dupIds.unionByName(flagged).distinct()
          .coalesce(4).localCheckpoint(true)
        state = Option(state).map(_.unionByName(bb)).getOrElse(bb)
          .coalesce(4).localCheckpoint(true)
      }
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch(perBatch)
      .start()
    q.processAllAvailable()
    q.stop()
    val dups = dupIds.count()
    import spark.implicits._
    Seq((totalDocs, totalDocs - dups, dups))
      .toDF("n_docs", "n_unique", "n_dupes")
  }
}
