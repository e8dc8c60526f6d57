package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, and run decode / feature-extraction as partition-local
  * batch functions (the Scala analogue of `mapInPandas` batches).
  *
  * Image decode is REAL: `javax.imageio` (JDK-shipped, zero extra deps)
  * decodes PNG/JPEG payloads to width/height/channels/avg-luma per
  * partition batch. Non-image payloads fall back to the byte-stat stub.
  * Audio/video would follow the same batch shape with their codecs.
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

  /** Byte-stat extraction over partitions of binary payloads — the
    * fallback tier for payloads no registered codec understands. The
    * batch shape (Iterator[Row] → Iterator[Row], one JVM call per
    * partition, zero driver involvement) is shared with the real decoder
    * below.
    */
  def extractFeatures(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    val rdd = withBin.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val header = if (bytes.nonEmpty) bytes(0) & 0xff else -1
        var cks = 0L
        var i = 0
        while (i < bytes.length) { cks = (cks * 131 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        Row(id, bytes.length, header, cks)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  // =====================================================================
  // Real image decode (javax.imageio — JDK-shipped)
  // =====================================================================

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("avg_luma", DoubleType)))

  /** Deterministic grayscale test pattern for doc `id`: dimensions and
    * pixel values are pure functions of (id, x, y), so a SQL oracle can
    * replay the decoded stats without ever touching the PNG bytes —
    * proving the decode is real (a fake decoder can't reproduce avg-luma
    * through the lossless PNG round-trip).
    */
  def patternDims(id: Long): (Int, Int) = ((8 + id % 8).toInt, (8 + id % 5).toInt)
  def patternPixel(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Attach payloads: even doc_ids get REAL PNG bytes (ImageIO.write of
    * the deterministic pattern — what reading image blobs off object
    * storage would yield), odd doc_ids keep raw text bytes to exercise
    * the non-image fallback path.
    */
  def withImagePayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val rdd = docs.select("doc_id", "text").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 2 == 0) {
          val (w, h) = patternDims(id)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, patternPixel(id, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        } else Row(id, r.getString(1).getBytes("UTF-8"))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL decode: sniff the PNG/JPEG magic, `ImageIO.read` per row inside
    * a partition batch, emit width/height/channels and exact-integer-sum
    * average luma (one double division at the end → SQL-replayable).
    * Non-image payloads take the fallback row with sentinel dims (−1) so
    * the output stays null-free and dtype-stable across engines.
    */
  def decodeImageFeatures(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    val rdd = withBin.select("doc_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val isPng = bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
        val isJpeg = bytes.length > 3 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8
        // ImageIO.read returns null (or throws) on payloads that pass the
        // magic sniff but are truncated/corrupt — those take the 'bin'
        // fallback row instead of NPE-ing the executor task.
        val img: java.awt.image.BufferedImage =
          if (isPng || isJpeg)
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          else null
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val bands = raster.getNumBands
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var s = 0
              var b = 0
              while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
              sum += s / bands
              x += 1
            }
            y += 1
          }
          Row(id, if (isPng) "png" else "jpeg", bytes.length, w, h, bands,
            sum.toDouble / (w.toLong * h))
        } else Row(id, "bin", bytes.length, -1, -1, 0, -1.0)
      }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }
}
