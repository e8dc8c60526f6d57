package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Qdrant points surface, DataFrame-first — the workload behind the
  * reference's Qdrant-compatible gRPC endpoint and its published
  * benchmark (`/root/reference/pkg/qdrantgrpc/points_service.go`;
  * `testing/benchmarks/nornic_vs_qdrant/README.md`: 20k points, dim 128,
  * k 10): payload-filtered vector search, count, keyset scroll, and
  * recommend.
  *
  * Filter semantics mirror `matchesFilter` (points_service.go:2029-2057):
  * ALL `must`, NONE of `mustNot`, and ≥1 `should` when present. One
  * deliberate Spark-first improvement: the reference over-fetches
  * candidates and filters them per node post-search
  * (points_service.go:1189-1224, `limit*10` when filtered); here the
  * payload predicate applies BEFORE the distance computation, so at scale
  * it prunes the scan (partition/row-group pruning on payload columns)
  * instead of multiplying the fetch.
  *
  * Scores route through the repo-wide DECIMAL cosine so every operation
  * hash-matches a DuckDB oracle.
  */
object QdrantPoints {

  /** must AND… / NOT any mustNot / any should (when present). */
  final case class Filter(must: Seq[Column] = Nil, mustNot: Seq[Column] = Nil,
      should: Seq[Column] = Nil)

  def pred(f: Filter): Column = {
    val mustC = f.must.reduceOption(_ && _).getOrElse(lit(true))
    val notC = f.mustNot.reduceOption(_ || _).map(!_).getOrElse(lit(true))
    val shouldC = f.should.reduceOption(_ || _).getOrElse(lit(true))
    mustC && notC && shouldC
  }

  /** Filtered cosine search: predicate → exact DECIMAL top-(offset+k) →
    * page → optional score threshold (threshold after ranking, the
    * reference's ScoreThreshold semantics). Returns (node, score).
    */
  def search(points: DataFrame, idCol: String, embCol: String,
      queryVec: Seq[Double], k: Int, filter: Filter = Filter(),
      minScore: Option[Double] = None, offset: Int = 0): DataFrame = {
    val top = VectorSearch.topKExactLit(points.filter(pred(filter)),
      idCol, embCol, queryVec, offset + k)
    val page = if (offset > 0) top.offset(offset) else top
    minScore.fold(page)(ms => page.filter(col("score") >= ms))
  }

  /** CountPoints (points_service.go:263): filtered exact count. */
  def countPoints(points: DataFrame, filter: Filter = Filter()): DataFrame =
    points.filter(pred(filter)).agg(count(lit(1)).as("count"))

  /** ScrollPoints (points_service.go:412): keyset pagination — ids
    * strictly after `afterId` in id order, `limit` rows. The keyset form
    * is the scale-safe one (no deep OFFSET scan).
    */
  def scroll(points: DataFrame, idCol: String, filter: Filter = Filter(),
      afterId: Option[Long] = None, limit: Int = 10): DataFrame = {
    val base = points.filter(pred(filter))
    afterId.fold(base)(a => base.filter(col(idCol) > a))
      .orderBy(col(idCol).asc)
      .select(col(idCol))
      .limit(limit)
  }

  /** Recommend (points_service.go:728,1054-1127): query vector =
    * avg(positive examples) − avg(negative examples), then the same
    * filtered search. Like the reference, example points are NOT excluded
    * from results. Example vectors are passed literally here (the
    * `PositiveVectors` form); id-resolved examples are a bounded point
    * lookup the caller can do first.
    */
  def recommendVector(positives: Seq[Seq[Double]],
      negatives: Seq[Seq[Double]]): Seq[Double] = {
    require(positives.nonEmpty, "at least one positive example is required")
    def avg(vs: Seq[Seq[Double]]): Seq[Double] =
      vs.transpose.map(xs => xs.sum / xs.length)
    val pos = avg(positives)
    if (negatives.isEmpty) pos
    else pos.zip(avg(negatives)).map { case (p, n) => p - n }
  }

  def recommend(points: DataFrame, idCol: String, embCol: String,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]], k: Int,
      filter: Filter = Filter()): DataFrame =
    search(points, idCol, embCol, recommendVector(positives, negatives), k,
      filter)

  // ========================================================= oracles =====

  /** DuckDB replay of [[search]] over the `embeddings` table with a
    * literal query vector and SQL filter clause.
    */
  def searchOracle(queryVec: Seq[Double], k: Int, dim: Int,
      filterSql: String = "TRUE", minScore: Option[Double] = None,
      offset: Int = 0): String = {
    val lits = queryVec.map(v => s"CAST($v AS DOUBLE)").mkString("[", ",", "]")
    val inner = s"""
      WITH qv AS (SELECT $lits AS q),
      comp AS (
        SELECT e.vec_id,
          CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
          CAST(SUM(CAST(q[i] * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS nb2
        FROM embeddings e CROSS JOIN qv CROSS JOIN generate_series(1, $dim) t(i)
        WHERE $filterSql
        GROUP BY e.vec_id)
      SELECT vec_id AS node, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS score
      FROM comp ORDER BY score DESC, node LIMIT $k OFFSET $offset"""
    minScore.fold(inner)(ms =>
      s"SELECT * FROM ($inner) WHERE score >= $ms")
  }
}
