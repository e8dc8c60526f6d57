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
}
