package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reciprocal-rank-fusion hybrid search: fuse a BM25 ranking and a vector
  * ranking with `score = Σ w / (k + rank)`, k=60 — the reference's
  * `rrfHybridSearch` (`/root/reference/pkg/search/search.go:890`, constant
  * at `search.go:44`). Two ranked DataFrames → row_number windows → full
  * outer join on id → fused top-k. Window is over a single global ordering
  * of at most `perList` rows, so the shuffle is bounded by the candidate
  * list size, not the corpus.
  */
object Hybrid {

  val RrfK = 60

  /** rank column via deterministic (score desc, id asc) ordering. */
  private def ranked(df: DataFrame, idCol: String, scoreCol: String, limitN: Int): DataFrame =
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(limitN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
      .select(col(idCol).as("id"), col("rank"))

  /** Fuse two ranked lists (id, score) into RRF top-k:
    * `score = w_text/(K+rank_text) + w_vec/(K+rank_vec)` — weighted RRF
    * per the reference's VectorWeight/BM25Weight options
    * (`search.go:169-171`; both default 1.0).
    */
  def rrf(bm25: DataFrame, vec: DataFrame, idColA: String, idColB: String,
      perList: Int, k: Int, wText: Double = 1.0, wVec: Double = 1.0): DataFrame = {
    val ra = ranked(bm25, idColA, "score", perList).withColumnRenamed("rank", "rank_text")
    val rb = ranked(vec, idColB, "cos_sim", perList).withColumnRenamed("rank", "rank_vec")
    ra.join(rb, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(wText) / (lit(RrfK) + col("rank_text")), lit(0.0)) +
          coalesce(lit(wVec) / (lit(RrfK) + col("rank_vec")), lit(0.0)))
      .select("id", "rrf")
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** [[rrf]] with per-leg rank diagnostics kept (the SearchHit
    * explainability fields, nornicdb_search.proto: rrf_score /
    * vector_rank / bm25_rank; 0 = absent from that leg).
    */
  def rrfDetailed(bm25: DataFrame, vec: DataFrame, idColA: String,
      idColB: String, perList: Int, k: Int, wText: Double = 1.0,
      wVec: Double = 1.0): DataFrame = {
    val ra = ranked(bm25, idColA, "score", perList).withColumnRenamed("rank", "rank_text")
    val rb = ranked(vec, idColB, "cos_sim", perList).withColumnRenamed("rank", "rank_vec")
    ra.join(rb, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(wText) / (lit(RrfK) + col("rank_text")), lit(0.0)) +
          coalesce(lit(wVec) / (lit(RrfK) + col("rank_vec")), lit(0.0)))
      .select(col("id"), col("rrf"),
        coalesce(col("rank_text"), lit(0)).cast("int").as("bm25_rank"),
        coalesce(col("rank_vec"), lit(0)).cast("int").as("vector_rank"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** Query-shape-adaptive (vectorWeight, bm25Weight) — the reference's
    * `GetAdaptiveRRFConfig` (`search.go:2081`): short queries (≤2 words)
    * lack context so keywords are more reliable (0.5/1.5); long queries
    * (≥6 words) carry semantic intent (1.5/0.5); medium stay balanced
    * (1.0/1.0).
    */
  def adaptiveWeights(query: String): (Double, Double) = {
    val words = query.trim.split("\\s+").count(_.nonEmpty)
    if (words <= 2) (0.5, 1.5)
    else if (words >= 6) (1.5, 0.5)
    else (1.0, 1.0)
  }
}
