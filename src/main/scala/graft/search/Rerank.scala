package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cross-encoder rerank stage (SURVEY §2.11 "skip or stub";
  * `/root/reference/pkg/search/rerank.go:132`): takes bi-encoder candidates
  * (id, content, bi_score), scores (query, content) pairs with a
  * cross-encoder, and re-ranks by the new score — the reference's
  * `CrossEncoder.Rerank` result shape (OriginalRank/NewRank/BiScore/
  * CrossScore/FinalScore) exactly.
  *
  * The encoder is a pluggable `(candidates, query) → candidates +
  * cross_score` function. The reference calls an external model-serving
  * API per batch (`rerank.go:180`, `callRerankAPI`); this container has no
  * model runtime, so the default encoder is a DISCLOSED STUB scoring by
  * lexical Jaccard overlap — deterministic, SQL-replayable, and running
  * through the same distributed plumbing a real cross-encoder UDF would
  * (per-partition batch scoring over the candidate DataFrame; swap in an
  * mlflow/ONNX scorer by passing a different `Encoder`).
  */
object Rerank {

  /** Adds a `cross_score` column to (id, content, bi_score) candidates. */
  type Encoder = (DataFrame, String) => DataFrame

  // process-wide injection point, mirroring graft.functions.Embedder: a
  // deployment installs its model-serving scorer once (Rerank.set) and
  // every call site resolves it at run time — no edits
  private val cur = new java.util.concurrent.atomic.AtomicReference[Encoder](
    lexicalOverlapEncoder)
  def current: Encoder = cur.get
  def set(e: Encoder): Unit = cur.set(e)
  def withEncoder[T](e: Encoder)(f: => T): T = {
    val prev = cur.getAndSet(e)
    try f finally cur.set(prev)
  }

  /** STUB model: Jaccard overlap between distinct lowercased whitespace
    * tokens of query and content, computed as inter / (|a| + |q| − inter)
    * so an oracle can replay the exact double division.
    */
  def lexicalOverlapEncoder: Encoder = (df, query) => {
    val qTokens = query.toLowerCase.split("\\s+").distinct.toSeq
    df.withColumn("_ct", array_distinct(split(lower(col("content")), " ")))
      .withColumn("_inter", size(array_intersect(col("_ct"), typedLit(qTokens))))
      .withColumn("cross_score",
        col("_inter") / (size(col("_ct")) + lit(qTokens.size) - col("_inter")).cast("double"))
      .drop("_ct", "_inter")
  }

  /** Rerank candidates for `query`. Disabled → pass-through (the
    * reference's `passThrough`, rerank.go:195: cross = final = bi score,
    * ranks unchanged). Enabled → score, re-rank, then drop rows below
    * `minScore` AFTER new ranks are assigned (RerankMinScore semantics,
    * rerank.go:178-186: the surviving rows keep their pre-filter rank
    * numbers). Returns (id, original_rank, new_rank, bi_score,
    * cross_score, final_score) ordered by new_rank.
    *
    * `encoder = null` (the default) resolves the process-wide
    * [[Rerank.current]] seam at call time.
    */
  def rerank(candidates: DataFrame, query: String,
      encoder: Encoder = null, topK: Int = 100,
      enabled: Boolean = true, minScore: Double = 0.0): DataFrame = {
    val byBi = Window.orderBy(col("bi_score").desc, col("id").asc)
    val orig = candidates
      .orderBy(col("bi_score").desc, col("id").asc).limit(topK)
      .withColumn("original_rank", row_number().over(byBi))
    val enc = Option(encoder).getOrElse(current)
    if (!enabled)
      orig.withColumn("cross_score", col("bi_score"))
        .withColumn("final_score", col("bi_score"))
        .withColumn("new_rank", col("original_rank"))
        .select("id", "original_rank", "new_rank", "bi_score", "cross_score",
          "final_score")
    else
      enc(orig, query)
        .withColumn("final_score", col("cross_score"))
        .withColumn("new_rank", row_number().over(
          Window.orderBy(col("final_score").desc, col("id").asc)))
        .filter(col("cross_score") >= minScore)
        .select("id", "original_rank", "new_rank", "bi_score", "cross_score",
          "final_score")
  }
}
