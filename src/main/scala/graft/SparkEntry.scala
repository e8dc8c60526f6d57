package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query in
  * [[QueryRegistry]] (with a DuckDB oracle when SQL-expressible); this object
  * just re-exports the registry in the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own headline benchmark family: revenue per region/nation
    * through the full star join (BASELINE.md "top products by revenue").
    */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.all("q_join_multihop").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryRegistry.queryFns

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracles
}
