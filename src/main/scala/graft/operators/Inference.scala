package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.GraphStore

/** Relationship auto-inference (SURVEY §2.12 — the reference infers edges
  * on store/access, `/root/reference/pkg/inference/inference.go:1-40`).
  * Here it is a BATCH job, the shape that scales: embedding near-duplicate
  * pairs above a cosine threshold become SIMILAR_TO edges, written to the
  * snapshot store in one pass. Pair generation is [[Dedup.embeddingNearDups]]
  * (block-pair equi-join — distributed-GEMM shape, no nested-loop join); set
  * `lsh = true` to route through [[Dedup.embeddingNearDupsLsh]]'s bucketed
  * candidates instead, the cheaper path at production thresholds (≥ ~0.7).
  */
object Inference {

  /** Infer SIMILAR_TO edges between `<idPrefix><vec_id>` nodes for every
    * embedding pair with cosine ≥ threshold. Returns edges created.
    */
  def inferSimilarEdges(store: GraphStore, emb: DataFrame, idPrefix: String,
      threshold: Double, maxId: Long, lsh: Boolean = false): Long = {
    val pairs =
      if (lsh) Dedup.embeddingNearDupsLsh(emb, threshold, maxId)
      else Dedup.embeddingNearDups(emb, threshold, maxId)
    val edges = pairs.select(
      concat_ws("|", lit("SIMILAR_TO"),
        concat(lit(idPrefix), col("a")), concat(lit(idPrefix), col("b"))).as("id"),
      concat(lit(idPrefix), col("a")).as("src"),
      concat(lit(idPrefix), col("b")).as("dst"),
      lit("SIMILAR_TO").as("rel_type"),
      map(lit("auto_generated"), lit("true"),
        lit("confidence"), col("cos_sim").cast("string")).as("properties"),
      col("cos_sim").as("weight"))
    store.createEdges(edges).relationshipsCreated
  }

  import org.apache.spark.sql.Column

  /** Similarity-score → edge-confidence banding
    * (`pkg/inference/inference.go:785-798`). */
  def scoreToConfidence(score: Column): Column =
    when(score >= 0.95, 0.9)
      .when(score >= 0.90, 0.7)
      .when(score >= 0.85, 0.5)
      .otherwise(0.3)

  /** Transitive closure suggestions (`pkg/inference/inference.go:736-777`):
    * for every A→B and B→C with A ≠ C, suggest A-RELATES_TO→C with
    * confidence conf(AB)·conf(BC) when it clears minConf. One suggestion per
    * (AB, BC) pair, like the reference's nested loop — re-expressed as a
    * self-equi-join on the middle node, the shuffle-on-join-key shape that
    * scales (the Go adjacency map is the driver-memory equivalent).
    *
    * Input columns: `src`, `dst`, `confidence`.
    */
  def suggestTransitive(edges: DataFrame, minConf: Double): DataFrame = {
    val ab = edges.select(col("src").as("a"), col("dst").as("b"),
      col("confidence").as("conf_ab"))
    val bc = edges.select(col("src").as("b"), col("dst").as("c"),
      col("confidence").as("conf_bc"))
    ab.join(bc, "b")
      .filter(col("a") =!= col("c"))
      .withColumn("confidence", col("conf_ab") * col("conf_bc"))
      .filter(col("confidence") >= minConf)
      .select(
        col("a").as("source_id"),
        col("c").as("target_id"),
        lit("RELATES_TO").as("rel_type"),
        col("confidence"),
        concat(lit("Transitive via "), col("b")).as("reason"),
        lit("transitive").as("method"))
  }

  /** The reference's per-label materialization cooldowns
    * (`pkg/inference/cooldown.go:59-70`), in seconds. */
  val defaultCooldownSeconds: Map[String, Long] = Map(
    "relates_to" -> 300L, "similar_to" -> 600L, "coaccess" -> 60L,
    "topology" -> 900L, "depends_on" -> 1800L, "references" -> 300L,
    "semantic_link" -> 600L)
  val fallbackCooldownSeconds = 300L

  /** Cooldown gate (`pkg/inference/cooldown.go:123-151`): a suggestion for
    * (src, dst, label) is allowed iff the pair was never materialized or
    * `elapsed >= cooldown(label)` (inclusive). Adds `allowed` and the
    * reference's reason strings. `prior` columns: `src`, `dst`, `label`,
    * `materialized_at` (the CooldownTable entry map); suggestions join it on
    * the key — prior is a broadcast-sized recent-edge set in practice.
    */
  def cooldownFilter(
      suggestions: DataFrame,
      prior: DataFrame,
      asOf: String,
      cooldowns: Map[String, Long] = defaultCooldownSeconds): DataFrame = {
    val lastPer = prior.groupBy("src", "dst", "label")
      .agg(max("materialized_at").as("last_at"))
    val cd = cooldowns.foldLeft(lit(fallbackCooldownSeconds)) {
      case (acc, (l, secs)) => when(col("label") === l, secs).otherwise(acc)
    }
    val elapsed = unix_seconds(lit(asOf).cast("timestamp")) -
      unix_seconds(col("last_at"))
    suggestions
      .join(broadcast(lastPer), Seq("src", "dst", "label"), "left")
      .withColumn("allowed", col("last_at").isNull || elapsed >= cd)
      .withColumn("cooldown_reason",
        when(col("last_at").isNull, "first materialization for this pair")
          .when(col("allowed"), "cooldown expired")
          .otherwise("cooldown active"))
      .drop("last_at")
  }
}
