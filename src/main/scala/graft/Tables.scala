package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Small dimension tables (`region`, `nation`) are broadcast-sized at every
  * scale factor; fact tables (`orders`, `lineitem`, `events`) scale with sf.
  * All reads are plain parquet scans so Catalyst pushes filters/column pruning
  * down to the file source.
  */
object Tables {
  val dimTables: Seq[String]  = Seq("region", "nation", "customer", "supplier", "part")
  val factTables: Seq[String] = Seq("orders", "lineitem", "events")
  val docTables: Seq[String]  = Seq("documents", "embeddings")
  val all: Seq[String]        = dimTables ++ factTables ++ docTables

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  /** The events table ships with whatever timestamp layout the generator
    * chose: parquet TIMESTAMP(NANOS) reads as a nanosecond long
    * (spark.sql.legacy.parquet.nanosAsLong), plain `timestamp[us]` reads as
    * TIMESTAMP/TIMESTAMP_NTZ. Normalize both to the same two columns: raw
    * nanos (`ts_ns`) and a TimestampType `ts` (matching DuckDB's
    * `CAST(ts AS TIMESTAMP)`; session TZ is UTC so NTZ→LTZ is identity).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(load(spark, sfDir, "events"))

  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
          .withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Streaming read of the events parquet with the SAME ts normalization as
    * the batch [[events]] loader — the schema is taken from the parquet
    * footer instead of being hardcoded, so a layout change in the testdata
    * cannot silently desynchronize batch and streaming semantics.
    */
  def eventsStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val batchSchema = load(spark, sfDir, "events").schema
    val stream = spark.readStream.schema(batchSchema)
      .option("basePath", sfDir)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    normalizeEventTs(stream)
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")

  /** Streaming read of the documents parquet (schema from the footer,
    * like [[eventsStreaming]]).
    */
  def documentsStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val batchSchema = load(spark, sfDir, "documents").schema
    spark.readStream.schema(batchSchema)
      .option("basePath", sfDir)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works over them. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
