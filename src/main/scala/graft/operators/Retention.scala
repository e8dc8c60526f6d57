package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-lifecycle / retention-policy sweeps.
  *
  * Behavioral spec: reference `pkg/retention/retention.go` —
  *   - `Policy.IsExpired` (retention.go:197-202): strict `now >
  *     createdAt + duration`, indefinite never expires.
  *   - `LegalHold.CoversData` (retention.go:246-270): hold must be active
  *     and unexpired; empty subject list = all subjects, empty category
  *     list = all categories.
  *   - `Manager.ShouldDelete` (retention.go:773-795): legal hold wins, then
  *     missing policy, then inactive policy, then the expiry check — the
  *     reasons are reproduced verbatim.
  *   - `Manager.ProcessRecord` (retention.go:797-840): expired records are
  *     archived first when the policy says so, then deleted.
  *   - `Manager.ProcessErasure` (retention.go:900-955): GDPR Art.17 — erase
  *     every record of the subject except those under legal hold; status is
  *     COMPLETED when nothing was retained, PARTIAL otherwise.
  *   - `DefaultPolicies` (retention.go:413-515): the stock compliance set.
  *
  * Spark-first shape: the policy table is broadcast-joined on `category`
  * (policies are tiny, records are the 100 TB side — no shuffle of the
  * fact table), and the hold check folds the hold list into one boolean
  * column expression evaluated inside whole-stage codegen. A sweep is a
  * single scan producing a per-record verdict; the archive/delete split is
  * two filters over the same classified frame.
  */
object Retention {

  /** How long to retain a category; None = indefinite (never expires). */
  final case class Policy(
      id: String,
      name: String,
      category: String,
      retentionHours: Option[Long],
      archiveBeforeDelete: Boolean = false,
      active: Boolean = true)

  /** Empty subjectIds/categories = covers all (retention.go:246-270).
    * expiresAt is an ISO timestamp literal; None = indefinite hold. */
  final case class LegalHold(
      id: String,
      subjectIds: Seq[String] = Nil,
      categories: Seq[String] = Nil,
      active: Boolean = true,
      expiresAt: Option[String] = None)

  /** The reference's stock compliance policies (retention.go:413-515). */
  def defaultPolicies: Seq[Policy] = Seq(
    Policy("audit-7y", "Audit Logs (7 Years)", "AUDIT", Some(7L * 365 * 24), archiveBeforeDelete = true),
    Policy("phi-6y", "PHI Retention (6 Years)", "PHI", Some(6L * 365 * 24), archiveBeforeDelete = true),
    Policy("pii-gdpr", "PII (GDPR Minimization)", "PII", Some(3L * 365 * 24)),
    Policy("financial-7y", "Financial Records (7 Years)", "FINANCIAL", Some(7L * 365 * 24), archiveBeforeDelete = true),
    Policy("user-1y", "User Data (1 Year)", "USER", Some(365L * 24)),
    Policy("analytics-90d", "Analytics (90 Days)", "ANALYTICS", Some(90L * 24)),
    Policy("system-indefinite", "System Data", "SYSTEM", None))

  /** One boolean column: is (subject_id, category) under any hold active at
    * asOf? Hold lists are human-scale, so this folds to a codegen'd
    * predicate instead of a join (retention.go:760-771 iterates the same
    * way). */
  private def heldCol(holds: Seq[LegalHold], asOf: String): Column =
    holds
      .filter(_.active)
      .map { h =>
        val unexpired = h.expiresAt match {
          case Some(ts) => lit(asOf).cast("timestamp") < lit(ts).cast("timestamp")
          case None     => lit(true)
        }
        val subjectMatch =
          if (h.subjectIds.isEmpty) lit(true) else col("subject_id").isin(h.subjectIds: _*)
        val categoryMatch =
          if (h.categories.isEmpty) lit(true) else col("category").isin(h.categories: _*)
        unexpired && subjectMatch && categoryMatch
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Classify every record against the policy set as of a fixed instant.
    *
    * Input columns: `subject_id: string`, `category: string`,
    * `created_at: timestamp` (other columns pass through). Adds
    * `action` ∈ {RETAIN, DELETE, ARCHIVE_DELETE} and the reference's
    * `reason` strings (retention.go:773-795).
    */
  def classify(
      records: DataFrame,
      policies: Seq[Policy],
      holds: Seq[LegalHold],
      asOf: String): DataFrame = {
    val dup = policies.groupBy(_.category).collect { case (c, ps) if ps.size > 1 => c }
    require(dup.isEmpty, s"one policy per category required; duplicates: ${dup.mkString(",")}")

    val spark = records.sparkSession
    import spark.implicits._
    val polDf = policies
      .map(p => (p.category, p.retentionHours, p.archiveBeforeDelete, p.active))
      .toDF("category", "p_hours", "p_archive", "p_active")

    val asOfTs   = lit(asOf).cast("timestamp")
    val expiresAt = col("created_at") + expr("make_interval(0, 0, 0, 0, p_hours, 0, 0)")
    val expired  = col("p_hours").isNotNull && asOfTs > expiresAt

    records
      .join(broadcast(polDf), Seq("category"), "left")
      .withColumn("held", heldCol(holds, asOf))
      .withColumn(
        "reason",
        when(col("held"), "under legal hold")
          .when(col("p_active").isNull, "no policy found")
          .when(!col("p_active"), "policy inactive")
          .when(expired, "retention period expired")
          .otherwise("within retention period"))
      .withColumn(
        "action",
        when(col("reason") === "retention period expired",
          when(col("p_archive"), "ARCHIVE_DELETE").otherwise("DELETE"))
          .otherwise("RETAIN"))
      .drop("held", "p_hours", "p_archive", "p_active")
  }

  /** The sweep split: (records to archive-then-delete, records to delete
    * outright, records retained). Three filters over one classified frame —
    * Spark caches/reuses the scan; at scale each side is written/deleted by
    * the cluster writers (ProcessRecord, retention.go:797-840). */
  def sweep(
      records: DataFrame,
      policies: Seq[Policy],
      holds: Seq[LegalHold],
      asOf: String): (DataFrame, DataFrame, DataFrame) = {
    val classified = classify(records, policies, holds, asOf)
    (classified.filter(col("action") === "ARCHIVE_DELETE"),
     classified.filter(col("action") === "DELETE"),
     classified.filter(col("action") === "RETAIN"))
  }

  /** GDPR Art.17 erasure for one subject (retention.go:900-955): every
    * record of the subject is erased unless under legal hold. Adds
    * `erased: boolean` and `reason`. */
  def processErasure(
      records: DataFrame,
      subjectId: String,
      holds: Seq[LegalHold],
      asOf: String): DataFrame =
    records
      .filter(col("subject_id") === subjectId)
      .withColumn("held", heldCol(holds, asOf))
      .withColumn("erased", !col("held"))
      .withColumn("reason", when(col("held"), "legal hold").otherwise("erased"))
      .drop("held")

  /** One-row erasure report in the reference's ErasureRequest shape:
    * COMPLETED when nothing was retained, PARTIAL otherwise
    * (retention.go:946-950). */
  def erasureSummary(
      records: DataFrame,
      subjectId: String,
      holds: Seq[LegalHold],
      asOf: String): DataFrame =
    processErasure(records, subjectId, holds, asOf)
      .agg(
        count(lit(1)).as("items_found"),
        sum(when(col("erased"), 1L).otherwise(0L)).as("items_erased"),
        sum(when(!col("erased"), 1L).otherwise(0L)).as("items_retained"))
      .withColumn(
        "status",
        when(col("items_retained") > 0, "PARTIAL").otherwise("COMPLETED"))
}
