package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retention
import graft.operators.Retention.{LegalHold, Policy}

/** Retention / data-lifecycle semantics (pkg/retention/retention.go). */
class RetentionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def recs = Seq(
    // (record_id, subject_id, category, created_at)
    (1L, "u1", "ANALYTICS", "2024-01-01 00:00:00"),
    (2L, "u1", "ANALYTICS", "2024-01-24 00:00:00"),
    (3L, "u2", "PII", "2024-01-01 00:00:00"),
    (4L, "u3", "FINANCIAL", "2024-01-01 00:00:00"),
    (5L, "u3", "UNMAPPED", "2024-01-01 00:00:00"),
    (6L, "u4", "SYSTEM", "2024-01-01 00:00:00"))
    .toDF("record_id", "subject_id", "category", "created_at")
    .withColumn("created_at", col("created_at").cast("timestamp"))

  private val policies = Seq(
    Policy("a", "analytics", "ANALYTICS", Some(168L)),
    Policy("p", "pii", "PII", Some(72L)),
    Policy("f", "fin", "FINANCIAL", Some(48L), archiveBeforeDelete = true),
    Policy("s", "sys", "SYSTEM", Some(24L), active = false))

  private val asOf = "2024-01-25 00:00:00"

  test("ShouldDelete cascade: hold > no policy > inactive > expiry") {
    val holds = Seq(LegalHold("h1", Seq("u2"), Seq("PII")))
    val out = Retention.classify(recs, policies, holds, asOf)
      .select("record_id", "action", "reason")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("DELETE", "retention period expired"))
    assert(out(2L) == ("RETAIN", "within retention period"))
    assert(out(3L) == ("RETAIN", "under legal hold"))
    assert(out(4L) == ("ARCHIVE_DELETE", "retention period expired"))
    assert(out(5L) == ("RETAIN", "no policy found"))
    assert(out(6L) == ("RETAIN", "policy inactive"))
  }

  test("hold coverage: empty lists cover all; expiry honored at asOf") {
    // empty subjects+categories = everything held
    val all = Retention.classify(recs, policies, Seq(LegalHold("h")), asOf)
    assert(all.filter(col("reason") === "under legal hold").count() == 6)
    // lapsed hold has no effect
    val lapsed = Seq(LegalHold("h", expiresAt = Some("2024-01-10 00:00:00")))
    assert(Retention.classify(recs, policies, lapsed, asOf)
      .filter(col("reason") === "under legal hold").count() == 0)
    // inactive hold has no effect
    val inactive = Seq(LegalHold("h", active = false))
    assert(Retention.classify(recs, policies, inactive, asOf)
      .filter(col("reason") === "under legal hold").count() == 0)
  }

  test("indefinite policy never expires") {
    val pol = Seq(Policy("x", "keep", "ANALYTICS", None))
    val out = Retention.classify(recs.filter(col("category") === "ANALYTICS"), pol, Nil, asOf)
    assert(out.filter(col("reason") === "within retention period").count() == 2)
  }

  test("sweep splits by action") {
    val (archive, delete, retain) = Retention.sweep(recs, policies, Nil, asOf)
    assert(archive.select("record_id").as[Long].collect().toSet == Set(4L))
    assert(delete.select("record_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(retain.count() == 3)
  }

  test("erasure: holds retain, status PARTIAL/COMPLETED") {
    val holds = Seq(LegalHold("h1", Seq("u3"), Seq("FINANCIAL")))
    val part = Retention.erasureSummary(recs, "u3", holds, asOf).collect()(0)
    assert(part.getAs[Long]("items_found") == 2)
    assert(part.getAs[Long]("items_erased") == 1)
    assert(part.getAs[Long]("items_retained") == 1)
    assert(part.getAs[String]("status") == "PARTIAL")
    val full = Retention.erasureSummary(recs, "u1", holds, asOf).collect()(0)
    assert(full.getAs[Long]("items_erased") == 2)
    assert(full.getAs[String]("status") == "COMPLETED")
  }

  test("default policy set mirrors the reference categories") {
    val p = Retention.defaultPolicies
    assert(p.map(_.category).toSet ==
      Set("AUDIT", "PHI", "PII", "FINANCIAL", "USER", "ANALYTICS", "SYSTEM"))
    assert(p.find(_.category == "SYSTEM").get.retentionHours.isEmpty)
    assert(p.find(_.category == "AUDIT").get.archiveBeforeDelete)
    assert(p.find(_.category == "ANALYTICS").get.retentionHours.contains(90L * 24))
  }

  test("classify plan broadcasts the policy table") {
    val plan = Retention.classify(recs, policies, Nil, asOf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("registry rows run at sf0.001 and agree with expectations") {
    val cls = QueryRegistry.all("q_retention_classify").fn(spark, sf)
    val byReason = cls.groupBy("reason").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason.contains("retention period expired"))
    assert(byReason.contains("under legal hold"))
    assert(byReason.contains("policy inactive"))
    val er = QueryRegistry.all("q_retention_erasure").fn(spark, sf)
    assert(er.filter(!col("erased")).count() > 0)
  }
}
