package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-layout source path (SURVEY §2.1 / §4 "partitioning & shuffle"):
  * fact tables written `bucketBy(join-key)` join WITHOUT an Exchange on
  * either side — the 100 TB answer to the repeated lineitem⋈orders join.
  * One one-time bucketed write (at scale: the ingest job's layout
  * decision) converts every later join/aggregation on the key from a
  * full shuffle into a zipped per-bucket merge.
  *
  * The reference keeps adjacency in-memory per node
  * (`pkg/storage/types.go`), which IS its co-location; this is the
  * columnar analog.
  */
object Bucketing {

  private val prepared = new ConcurrentHashMap[String, Boolean]()

  /** Idempotently write lineitem + orders bucketed by order key as
    * external tables (one bucketed layout per sf-dir per JVM; stale
    * layouts from previous JVMs are dropped and rewritten). The layout
    * root rides the shared artifact-dir contract
    * (`spark.graft.artifactDir` / GRAFT_ARTIFACT_DIR, default /tmp) so a
    * deployment points it at durable shared storage like every other
    * derived artifact.
    */
  def prepare(spark: SparkSession, sfDir: String, nBuckets: Int = 16): Unit =
    prepared.computeIfAbsent(sfDir, _ => {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val root = graft.Artifacts.root(spark)
      def write(src: String, table: String, key: String): Unit = {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val path = s"$root/graft_warehouse/$table"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
        spark.read.parquet(s"$sfDir/$src.parquet")
          .write.bucketBy(nBuckets, key).sortBy(key)
          .option("path", path).mode("overwrite").saveAsTable(table)
      }
      write("lineitem", s"lineitem_b$tag", "l_orderkey")
      write("orders", s"orders_b$tag", "o_orderkey")
      true
    })

  /** The co-located join over the bucketed layout: per-order quantity sums
    * rolled up to order priority. The lineitem⋈orders join plans with NO
    * Exchange (asserted in spec); only the final small rollup shuffles.
    */
  def revenueByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    prepare(spark, sfDir)
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    spark.table(s"lineitem_b$tag")
      .join(spark.table(s"orders_b$tag"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("n_items"))
  }
}
