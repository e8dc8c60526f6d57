package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GraphStore, PropertyGraph}
import graft.operators.Privacy

/** GDPR privacy surface (db_privacy.go, db_admin.go:1239-1439): consent
  * ledger semantics, ownership export, erasure, pseudonymization.
  */
class PrivacySpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val isCust = array_contains(col("labels"), "Customer")
    val tagged = g.nodes.withColumn("properties",
      when(isCust, map_concat(col("properties"),
        map(lit("owner_id"), concat(lit("user"), col("key") % 10),
          lit("email"), concat(col("name"), lit("@example.com")),
          lit("ip_address"), lit("10.0.0.1"))))
        .otherwise(col("properties")))
    new GraphStore(PropertyGraph(tagged, g.edges), registerGlobal = false)
  }

  test("consent: record, replace on re-record, revoke, absent = false") {
    val store = freshStore()
    assert(!Privacy.hasConsent(store, "u1", "training")) // no record
    Privacy.recordConsent(store, "u1", "training", given = true, source = "web_form")
    assert(Privacy.hasConsent(store, "u1", "training"))
    // re-record REPLACES properties (RecordConsent upsert semantics)
    Privacy.recordConsent(store, "u1", "training", given = false, source = "api")
    assert(!Privacy.hasConsent(store, "u1", "training"))
    assert(store.snapshot.nodes
      .filter(col("id") === Privacy.consentId("u1", "training")).count() === 1)
    // revoke on an ABSENT record creates it with source=revocation
    Privacy.revokeConsent(store, "u1", "marketing")
    val rows = Privacy.userConsents(store, "u1").collect()
    assert(rows.length === 2)
    val mk = rows.find(_.getAs[String]("purpose") == "marketing").get
    assert(!mk.getAs[Boolean]("given") && mk.getAs[String]("source") == "revocation")
    // empty user/purpose are rejected (db_privacy.go:46-51)
    intercept[IllegalArgumentException] {
      Privacy.recordConsent(store, "", "x", given = true)
    }
  }

  test("export returns exactly the owned nodes") {
    val store = freshStore()
    val owned = Privacy.exportUserData(store, "user3").collect()
    val expected = GraphQueries.graph(spark, sf).nodes
      .filter(array_contains(col("labels"), "Customer") && col("key") % 10 === 3)
      .count()
    assert(owned.length.toLong === expected && expected > 0)
    assert(owned.forall(_.getAs[Map[String, String]]("properties")("owner_id") == "user3"))
  }

  test("anonymize: pseudonymous owner, PII stripped, name nulled, idempotent id") {
    val store = freshStore()
    val before = Privacy.exportUserData(store, "user4").count()
    Privacy.anonymizeUserData(store, "user4")
    assert(Privacy.exportUserData(store, "user4").count() === 0)
    val anon = store.snapshot.nodes.filter(
      element_at(col("properties"), "owner_id") === Privacy.anonymousId("user4"))
    assert(anon.count() === before)
    val r = anon.head()
    val props = r.getAs[Map[String, String]]("properties")
    assert(!props.contains("email") && !props.contains("ip_address") &&
      !props.contains("name"))
    assert(r.getAs[String]("name") == null)
    // deterministic pseudonym (disclosed deviation from the random id)
    assert(Privacy.anonymousId("user4") === Privacy.anonymousId("user4"))
    assert(Privacy.anonymousId("user4") !== Privacy.anonymousId("user5"))
  }

  test("delete removes owned nodes and their edges") {
    val store = freshStore()
    val n = Privacy.deleteUserData(store, "user6")
    assert(n > 0)
    assert(Privacy.exportUserData(store, "user6").count() === 0)
    // no dangling PLACED edges from deleted customers
    val nodeIds = store.snapshot.nodes.select(col("id").as("nid"))
    val dangling = store.snapshot.edges
      .join(nodeIds, col("src") === col("nid"), "left_anti").count()
    assert(dangling === 0)
  }
}
