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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * nanosecond long (spark.sql.legacy.parquet.nanosAsLong). Expose both the
    * raw nanos (`ts_ns`) and a microsecond-truncated TimestampType `ts`
    * (matching DuckDB's `CAST(ts AS TIMESTAMP)`).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts_ns", col("ts").cast("long"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works over them. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
