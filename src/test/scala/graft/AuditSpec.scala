package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audit

/** Audit-trail query/report semantics (pkg/audit/audit.go). */
class AuditSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def log = Seq(
    // (event_id, ts, user_id, event_type, resource_id, success)
    (1L, "2024-01-01 00:00:00", "u1", "LOGIN", "r1", true),
    (2L, "2024-01-02 00:00:00", "u1", "DATA_READ", "r1", true),
    (3L, "2024-01-03 00:00:00", "u2", "DATA_EXPORT", "r2", true),
    (4L, "2024-01-04 00:00:00", "u2", "LOGIN_FAILED", "r2", false),
    (5L, "2024-01-05 00:00:00", "", "BREACH_DETECTED", "r3", false),
    (6L, "2024-01-06 00:00:00", "u3", "ERASURE_REQUEST", "r3", true),
    (7L, "2024-01-07 00:00:00", "u3", "DATA_DELETE", "r3", true))
    .toDF("event_id", "ts", "user_id", "event_type", "resource_id", "success")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("query: inclusive time range on both ends") {
    val ids = Audit.query(log,
      start = Some("2024-01-02 00:00:00"), end = Some("2024-01-06 00:00:00"))
      .select("event_id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("query: equality filters compose") {
    assert(Audit.query(log, userId = Some("u2")).count() == 2)
    assert(Audit.query(log, userId = Some("u2"), success = Some(true)).count() == 1)
    assert(Audit.query(log, resourceId = Some("r3")).count() == 3)
    assert(Audit.query(log, eventTypes = Seq("LOGIN", "DATA_READ")).count() == 2)
  }

  test("preset reports: data access includes EXPORT, security bundles") {
    val da = Audit.dataAccessReport(log, "2024-01-01 00:00:00", "2024-01-31 00:00:00")
    assert(da.select("event_id").as[Long].collect().toSet == Set(2L, 3L, 7L))
    val sec = Audit.securityReport(log, "2024-01-01 00:00:00", "2024-01-31 00:00:00")
    assert(sec.select("event_id").as[Long].collect().toSet == Set(4L, 5L))
    val ua = Audit.userActivity(log, "u3", "2024-01-01 00:00:00", "2024-01-31 00:00:00")
    assert(ua.count() == 2)
  }

  test("compliance report: export excluded from data accesses, empty user ignored") {
    val r = Audit.complianceReport(log,
      "2024-01-01 00:00:00", "2024-01-31 00:00:00", "all").collect()(0)
    assert(r.getAs[Long]("total_events") == 7)
    assert(r.getAs[Long]("failed_logins") == 1)
    assert(r.getAs[Long]("data_accesses") == 2) // READ + DELETE, not EXPORT
    assert(r.getAs[Long]("erasure_requests") == 1)
    assert(r.getAs[Long]("security_alerts") == 1) // breach; LOGIN_FAILED is not
    assert(r.getAs[Long]("unique_users") == 3) // "" ignored
    assert(r.getAs[String]("period") == "all")
  }

  test("registry rows run at sf0.001 with plausible shapes") {
    val rep = QueryRegistry.all("q_audit_compliance_report").fn(spark, sf).collect()
    assert(rep.length == 1 && rep(0).getAs[Long]("total_events") > 0)
    val page = QueryRegistry.all("q_audit_user_activity").fn(spark, sf)
    assert(page.count() <= 50)
  }
}
