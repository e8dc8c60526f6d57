package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamDedup

/** Streaming MinHash-LSH near-dup (`q_stream_dedup_minhash`): the
  * ingest-side twin of the batch md5 tier. Asserts (a) the streaming
  * verdict set equals the batch-computed order-independent definition
  * (every band-colliding pair with signature agreement ≥ 8/16 flags its
  * larger doc_id), and (b) the counts are identical whether the corpus
  * arrives as ONE micro-batch or as many (maxFilesPerTrigger=1 over a
  * multi-file copy) — the cross-batch state join changes nothing.
  */
class StreamNearDupSpec extends AnyFunSuite {
  import TestSpark._

  private def batchTruth(sfDir: String): (Long, Long) = {
    val docs = Tables.documents(spark, sfDir)
    val bands = Dedup.minhashBands(docs, 3, 16, 4)
      .localCheckpoint(true)
    val agree = (0 until 16).map(i =>
      when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1)
        .otherwise(0)).reduce(_ + _)
    val dups = bands.select(col("doc_id").as("a"), col("band"), col("bsig"),
        col("sig").as("sig_a"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("bsig"),
        col("sig").as("sig_b")), Seq("band", "bsig"))
      .filter(col("a") < col("b") && agree >= 8)
      .select(col("b")).distinct().count()
    (docs.count(), dups)
  }

  test("single-batch stream matches the batch-computed verdict set") {
    val (total, dups) = batchTruth(sf)
    val row = StreamDedup.nearDupStats(spark, sf).collect().head
    assert(row.getLong(0) == total)
    assert(row.getLong(2) == dups, s"expected $dups near-dups")
    assert(row.getLong(1) == total - dups)
    assert(dups > 0, "fixture must contain near-duplicates for this to test anything")
  }

  test("multi-batch stream (maxFilesPerTrigger=1) produces identical counts") {
    val dir = Files.createTempDirectory("neardup").toFile
    dir.deleteOnExit()
    // split the corpus over several files so the file source feeds the
    // query one micro-batch per file
    Tables.documents(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val parts = Option(new java.io.File(s"$dir/docs").listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, "need multiple files for multiple micro-batches")

    val stream = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/docs")
    val (total, dups) = batchTruth(sf)
    val row = StreamDedup.nearDupOver(spark, stream, total).collect().head
    assert(row.getLong(0) == total && row.getLong(2) == dups,
      s"multi-batch run diverged: got ${row.getLong(2)}, expected $dups")
  }
}
