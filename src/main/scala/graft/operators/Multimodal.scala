package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, and run decode / feature-extraction as partition-local
  * batch functions (the Scala analogue of `mapInPandas` batches).
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libs in this container — see builder brief): it derives features from the
  * raw bytes. The Spark-side plumbing — schema, binary payload transport,
  * partition-batched extraction, downstream joins — is real and tested.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("header_byte", IntegerType),
    StructField("checksum", LongType)))

  /** Attach an opaque binary payload column (here: utf8 bytes of text —
    * stands in for image/audio bytes read from object storage).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** STUB decode: batch feature extraction over partitions of binary
    * payloads. A real implementation would decode pixels/samples here; the
    * batch shape (Iterator[Row] → Iterator[Row], one JVM call per
    * partition, zero driver involvement) is exactly what a codec would use.
    */
  def extractFeatures(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    val rdd = withBin.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // ??? real codec goes here — deterministic fake features instead:
        val header = if (bytes.nonEmpty) bytes(0) & 0xff else -1
        var cks = 0L
        var i = 0
        while (i < bytes.length) { cks = (cks * 131 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        Row(id, bytes.length, header, cks)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
