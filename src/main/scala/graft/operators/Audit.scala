package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compliance audit-trail queries and reports.
  *
  * Behavioral spec: reference `pkg/audit/audit.go` —
  *   - `Reader.Query` (audit.go:860-925): time range is start-inclusive AND
  *     end-INCLUSIVE (`Before(start)`/`After(end)` skips), equality filters
  *     on user/resource/success, offset/limit pagination over the filtered
  *     stream.
  *   - `GetUserActivity` / `GetDataAccessReport` / `GetSecurityReport`
  *     (audit.go:927-962): preset filter bundles.
  *   - `GenerateComplianceReport` (audit.go:1036-1080): per-type counters
  *     where DataAccesses counts READ/CREATE/UPDATE/DELETE but NOT EXPORT,
  *     erasures count request+complete, security counts alert+breach, and
  *     unique users ignore empty ids.
  *
  * The reference streams a JSON file on one node; here the log is a
  * DataFrame (partitioned parquet/JSON at scale) so every query is a
  * pushdown-friendly filter and every report one aggregation — shapes that
  * hold at 100 TB of audit trail.
  *
  * Expected columns: `ts timestamp`, `event_type string`, `user_id string`,
  * `resource_id string`, `success boolean` (extras pass through).
  */
object Audit {

  val dataAccessTypes = Seq("DATA_READ", "DATA_CREATE", "DATA_UPDATE",
    "DATA_DELETE", "DATA_EXPORT")
  val securityTypes = Seq("LOGIN_FAILED", "ACCESS_DENIED", "SECURITY_ALERT",
    "BREACH_DETECTED")

  /** `Reader.Query` as one composable filter; None = filter absent. The
    * result is UNORDERED (a distributed filter preserves no row order) —
    * callers that paginate must impose a total order first; use
    * [[paginate]], which requires explicit sort keys, instead of calling
    * `offset`/`limit` directly on this result. */
  def query(
      log: DataFrame,
      start: Option[String] = None,
      end: Option[String] = None,
      eventTypes: Seq[String] = Nil,
      userId: Option[String] = None,
      resourceId: Option[String] = None,
      success: Option[Boolean] = None): DataFrame = {
    var out = log
    start.foreach(t => out = out.filter(col("ts") >= lit(t).cast("timestamp")))
    end.foreach(t => out = out.filter(col("ts") <= lit(t).cast("timestamp")))
    if (eventTypes.nonEmpty) out = out.filter(col("event_type").isin(eventTypes: _*))
    userId.foreach(u => out = out.filter(col("user_id") === u))
    resourceId.foreach(r => out = out.filter(col("resource_id") === r))
    success.foreach(s => out = out.filter(col("success") === s))
    out
  }

  /** Deterministic offset/limit pagination (audit.go:905-922's slice over
    * the filtered stream). Requires explicit sort keys so the page is a
    * total order — the tiebreaker should make rows unique (e.g.
    * `ts, event_id`). */
  def paginate(filtered: DataFrame, sortKeys: Seq[String],
      offset: Int, limit: Int): DataFrame = {
    require(sortKeys.nonEmpty, "paginate requires at least one sort key")
    filtered.orderBy(sortKeys.map(col): _*).offset(offset).limit(limit)
  }

  /** GDPR Art.15 right-of-access trail (audit.go:927). */
  def userActivity(log: DataFrame, userId: String, start: String, end: String): DataFrame =
    query(log, Some(start), Some(end), userId = Some(userId))

  /** Data-access compliance listing (audit.go:936) — includes EXPORT. */
  def dataAccessReport(log: DataFrame, start: String, end: String): DataFrame =
    query(log, Some(start), Some(end), eventTypes = dataAccessTypes)

  /** Security-event listing (audit.go:951). */
  def securityReport(log: DataFrame, start: String, end: String): DataFrame =
    query(log, Some(start), Some(end), eventTypes = securityTypes)

  /** One-row ComplianceReport (audit.go:1036-1080). */
  def complianceReport(log: DataFrame, start: String, end: String,
      period: String): DataFrame = {
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    query(log, Some(start), Some(end)).agg(
      count(lit(1)).as("total_events"),
      cnt(col("event_type") === "LOGIN_FAILED").as("failed_logins"),
      cnt(col("event_type") === "ACCESS_DENIED").as("access_denied"),
      // the report's DataAccesses EXCLUDES export (audit.go:1068)
      cnt(col("event_type").isin("DATA_READ", "DATA_CREATE", "DATA_UPDATE",
        "DATA_DELETE")).as("data_accesses"),
      cnt(col("event_type").isin("ERASURE_REQUEST", "ERASURE_COMPLETE"))
        .as("erasure_requests"),
      cnt(col("event_type").isin("SECURITY_ALERT", "BREACH_DETECTED"))
        .as("security_alerts"),
      count_distinct(when(col("user_id") =!= "", col("user_id")))
        .as("unique_users"))
      .withColumn("period", lit(period))
  }
}
