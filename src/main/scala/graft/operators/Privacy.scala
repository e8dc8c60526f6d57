package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.GraphStore

/** GDPR privacy surface — the reference's consent ledger and user-data
  * operations (`/root/reference/pkg/nornicdb/db_privacy.go:38-213`,
  * `db_admin.go:1239-1439`):
  *
  *  - Consent ledger: one `Consent` node per (user, purpose) at id
  *    `consent:<user>:<purpose>`; [[recordConsent]] upserts (replacing
  *    properties like RecordConsent), [[revokeConsent]] writes
  *    given=false / source=revocation (creating the record if absent),
  *    [[hasConsent]] reads `given` (absent record = no consent),
  *    [[userConsents]] prefix-scans the user's records.
  *  - [[exportUserData]]: every node owned by the user (property
  *    `owner_id`), the Art. 20 portability export — a distributed filter,
  *    not the reference's driver-side stream.
  *  - [[deleteUserData]]: detach-delete all owned nodes (Art. 17).
  *  - [[anonymizeUserData]]: rewrite owned nodes under a pseudonymous
  *    owner, dropping the PII keys the reference strips (email, name,
  *    username, ip_address — db_admin.go:1419-1423). The anonymous id is
  *    a DETERMINISTIC sha1 of the user id (disclosed deviation: the
  *    reference draws a random id; a deterministic pseudonym keeps the
  *    operation oracle-checkable and idempotent).
  *
  * Ownership scans are full-table predicate filters — at 100 TB they ride
  * partition/row-group pruning on an `owner_id` column, no per-node loop.
  */
object Privacy {

  private val PiiKeys = Seq("email", "name", "username", "ip_address")

  def consentId(userId: String, purpose: String): String =
    s"consent:$userId:$purpose"

  def anonymousId(userId: String): String =
    "anon:" + java.security.MessageDigest.getInstance("SHA-1")
      .digest(userId.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  private def consentRow(store: GraphStore, userId: String, purpose: String,
      given: Boolean, timestamp: String, source: String): DataFrame = {
    val spark = store.snapshot.nodes.sparkSession
    import spark.implicits._
    Seq(consentId(userId, purpose)).toDF("id")
      .select(col("id"),
        array(lit("Consent")).as("labels"),
        lit(null).cast("long").as("key"),
        lit(null).cast("string").as("name"),
        lit(null).cast("double").as("acctbal"),
        lit(null).cast("string").as("mktsegment"),
        map(lit("user_id"), lit(userId), lit("purpose"), lit(purpose),
          lit("given"), lit(given.toString), lit("timestamp"), lit(timestamp),
          lit("source"), lit(source)).as("properties"))
  }

  /** Upsert a consent record, REPLACING an existing one's properties
    * (db_privacy.go:38-106). user/purpose must be non-empty.
    */
  def recordConsent(store: GraphStore, userId: String, purpose: String,
      given: Boolean, timestamp: String = "2024-01-01T00:00:00Z",
      source: String = "api"): Unit = {
    require(userId.nonEmpty, "user_id is required")
    require(purpose.nonEmpty, "purpose is required")
    // one keyed replace-or-insert commit (the reference's upsert shape),
    // not delete-then-create — half the probes, half the commits
    store.upsertNodes(consentRow(store, userId, purpose, given, timestamp, source))
  }

  /** given=false / source=revocation, creating the record when absent
    * (db_privacy.go:135-173).
    */
  def revokeConsent(store: GraphStore, userId: String, purpose: String,
      timestamp: String = "2024-01-01T00:00:00Z"): Unit =
    recordConsent(store, userId, purpose, given = false, timestamp, "revocation")

  /** No record = no consent (db_privacy.go:104-133). */
  def hasConsent(store: GraphStore, userId: String, purpose: String): Boolean =
    store.snapshot.nodes
      .filter(col("id") === consentId(userId, purpose))
      .select(element_at(col("properties"), "given"))
      .collect().headOption.exists(_.getString(0) == "true")

  /** All of a user's consent records (db_privacy.go:175-213). */
  def userConsents(store: GraphStore, userId: String): DataFrame =
    store.snapshot.nodes
      .filter(col("id").startsWith(s"consent:$userId:") &&
        array_contains(col("labels"), "Consent"))
      .select(
        element_at(col("properties"), "user_id").as("user_id"),
        element_at(col("properties"), "purpose").as("purpose"),
        (element_at(col("properties"), "given") === "true").as("given"),
        element_at(col("properties"), "source").as("source"))

  private def ownedBy(userId: String): Column =
    element_at(col("properties"), "owner_id") === userId

  /** Art. 20 export: (id, labels, properties) of every owned node. */
  def exportUserData(store: GraphStore, userId: String): DataFrame =
    store.snapshot.nodes.filter(ownedBy(userId))
      .select(col("id"), col("labels"), col("properties"))

  /** Art. 17 erasure: detach-delete every owned node (db_admin.go:1354). */
  def deleteUserData(store: GraphStore, userId: String): Long = {
    val ids = store.snapshot.nodes.filter(ownedBy(userId)).select("id")
    store.deleteNodes(ids, detach = true).nodesDeleted
  }

  /** Pseudonymize every owned node: owner_id → [[anonymousId]], PII keys
    * stripped from the property map, the hoisted `name` column nulled for
    * the rewritten rows (db_admin.go:1390-1439). One ownership scan finds
    * the victims; the rewrite itself is a keyed copy-on-write commit that
    * touches only the buckets holding owned rows — never the whole frame.
    */
  def anonymizeUserData(store: GraphStore, userId: String): Unit = {
    val anon = anonymousId(userId)
    val cleaned = map_concat(
      map_filter(col("properties"),
        (k, _) => !k.isin((PiiKeys :+ "owner_id").map(lit): _*)),
      map(lit("owner_id"), lit(anon)))
    val owned = store.snapshot.nodes.filter(ownedBy(userId)).select("id")
    store.updateNodes(owned)(_
      .withColumn("properties", cleaned)
      .withColumn("name", lit(null).cast("string")))
  }
}
