package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Inference

/** Auto-inference extensions: transitive suggestions, confidence banding,
  * cooldown gate (pkg/inference/inference.go, cooldown.go). */
class InferenceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("scoreToConfidence banding matches inference.go:785-798") {
    val out = Seq(0.96, 0.95, 0.93, 0.90, 0.87, 0.85, 0.5)
      .toDF("s").select(Inference.scoreToConfidence(col("s")).as("c"))
      .as[Double].collect().toSeq
    assert(out == Seq(0.9, 0.9, 0.7, 0.7, 0.5, 0.5, 0.3))
  }

  test("suggestTransitive composes A->B->C, skips cycles, multiplies conf") {
    val edges = Seq(
      ("A", "B", 0.8), ("B", "C", 0.9), ("B", "A", 0.9), // B->A would cycle
      ("C", "D", 0.5), ("X", "Y", 0.9))
      .toDF("src", "dst", "confidence")
    val sugg = Inference.suggestTransitive(edges, 0.4)
      .select("source_id", "target_id", "confidence", "reason", "method")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3), r.getString(4)))
    // A->B->C (0.72) and A->B->A skipped; B->C->D = 0.45; C->D has no tail
    assert(sugg.toSet == Set(
      ("A", "C", 0.8 * 0.9, "Transitive via B", "transitive"),
      ("B", "D", 0.9 * 0.5, "Transitive via C", "transitive")))
    // one suggestion per (AB, BC) pair — two middles give two rows
    val multi = Seq(("A", "B1", 1.0), ("A", "B2", 1.0), ("B1", "C", 1.0), ("B2", "C", 1.0))
      .toDF("src", "dst", "confidence")
    assert(Inference.suggestTransitive(multi, 0.5).count() == 2)
  }

  test("cooldownFilter: per-label windows, inclusive expiry, first-seen") {
    val sugg = Seq(
      ("a", "b", "relates_to"), // prior 240s ago, 300s window -> blocked
      ("a", "b", "coaccess"),   // prior 240s ago, 60s window -> allowed
      ("a", "c", "relates_to"), // no prior -> first materialization
      ("a", "d", "mystery"))    // unknown label, prior exactly 300s ago -> allowed (inclusive)
      .toDF("src", "dst", "label")
    val prior = Seq(
      ("a", "b", "relates_to", "2024-01-01 00:02:00"),
      ("a", "b", "coaccess", "2024-01-01 00:02:00"),
      ("a", "d", "mystery", "2024-01-01 00:01:00"))
      .toDF("src", "dst", "label", "materialized_at")
      .withColumn("materialized_at", col("materialized_at").cast("timestamp"))
    val out = Inference.cooldownFilter(sugg, prior, "2024-01-01 00:06:00")
      .collect().map(r => (r.getAs[String]("dst"), r.getAs[String]("label")) ->
        (r.getAs[Boolean]("allowed"), r.getAs[String]("cooldown_reason"))).toMap
    assert(out(("b", "relates_to")) == (false, "cooldown active"))
    assert(out(("b", "coaccess")) == (true, "cooldown expired"))
    assert(out(("c", "relates_to")) == (true, "first materialization for this pair"))
    assert(out(("d", "mystery")) == (true, "cooldown expired"))
  }

  test("decayEdges: manual/grace/delete/decay/keep cascade (edge_decay.go)") {
    val edges = Seq(
      // (a, b, confidence, auto, updatedDaysAgo)
      (1L, 2L, 0.9, true, 45),  // 0.9*0.95^45 = 0.089 -> DELETE
      (1L, 3L, 0.9, true, 8),   // 0.9*0.663 = 0.597 -> DECAY
      (1L, 4L, 0.9, true, 0),   // grace (created 0 days ago) -> GRACE
      (1L, 5L, 0.9, false, 45)) // manual -> SKIP_MANUAL
      .toDF("a", "b", "confidence", "auto_generated", "ago")
      .withColumn("updated_at",
        expr("timestamp '2024-02-15 00:00:00' - make_interval(0, 0, 0, ago, 0, 0, 0)"))
      .withColumn("created_at", col("updated_at"))
    val out = graft.operators.Inference.decayEdges(edges, "2024-02-15 00:00:00")
      .collect().map(r => r.getAs[Long]("b") ->
        (r.getAs[String]("action"), r.getAs[Double]("decayed_confidence"))).toMap
    assert(out(2L)._1 == "DELETE")
    assert(out(3L)._1 == "DECAY" && math.abs(out(3L)._2 - 0.9 * math.pow(0.95, 8)) < 1e-6)
    assert(out(4L) == ("GRACE", 0.9)) // untouched inside grace period
    assert(out(5L) == ("SKIP_MANUAL", 0.9))
  }

  test("registry rows run at sf0.001") {
    val tr = QueryRegistry.all("q_infer_transitive").fn(spark, sf)
    assert(tr.count() > 0)
    assert(tr.filter(col("method") =!= "transitive").count() == 0)
    val cd = QueryRegistry.all("q_infer_cooldown").fn(spark, sf)
    assert(cd.agg(sum("n")).as[Long].collect()(0) > 0)
  }
}
