package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine surface.
  *
  * @param fn     Spark implementation, given (session, sfDir)
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables
  *               (None → driver records a weaker rows-only check)
  * @param section SURVEY.md §2 section this operator belongs to
  */
case class GQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    section: String)

/** Central registry: every module contributes its queries here. */
object QueryRegistry {
  lazy val all: Map[String, GQuery] =
    RelationalQueries.queries ++
      GraphQueries.queries ++
      CypherQueries.queries ++
      SearchQueries.queries ++
      AlgoQueries.queries ++
      PipelineQueries.queries ++
      FunctionQueries.queries ++
      StreamingQueries.queries ++
      ExtQueries.queries ++
      ProcQueries.queries ++
      NorthwindQueries.queries ++
      MimirQueries.queries ++
      QdrantWorkload.queries ++
      EvolutionQueries.queries

  lazy val queryFns: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  lazy val oracles: Map[String, String] =
    all.collect { case (k, GQuery(_, Some(sql), _)) => k -> sql }
}

/** Oracle-determinism helpers.
  *
  * Double sums are order-dependent, so a Spark sum and a DuckDB sum of the
  * same doubles can differ in the low bits and fail a hash compare. Both
  * engines cast a double to DECIMAL deterministically (round-to-nearest on
  * identical input bits), decimal aggregation is exact, and exact
  * decimal→double is deterministic — so `CAST(SUM(CAST(x AS DECIMAL(18,s)))
  * AS DOUBLE)` is bit-identical across engines.
  */
object OracleSafe {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Exact (decimal-routed) sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean: decimal sum divided by count, in double arithmetic. */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** SQL fragments for the same operations (DuckDB side). */
  def sqlSum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlAvg(x: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($x)"
}
