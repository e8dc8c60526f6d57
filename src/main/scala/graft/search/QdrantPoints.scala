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

  /** SearchGroups (points_service.go:804-880): oversample the GLOBAL top
    * groupLimit×groupSize hits, group them by the payload field, order
    * groups by key (the reference sorts keys), keep the first groupLimit
    * groups trimmed to groupSize hits each. The global-key window runs on
    * ≤ groupLimit×groupSize rows (already reduced), so the single
    * partition is bounded by construction.
    */
  def searchGroups(points: DataFrame, idCol: String, embCol: String,
      queryVec: Seq[Double], groupByCol: String, groupLimit: Int = 3,
      groupSize: Int = 10, filter: Filter = Filter()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val over = search(points, idCol, embCol, queryVec,
      groupLimit * groupSize, filter)
    val keyed = over.join(
      points.select(col(idCol).as("node"),
        col(groupByCol).cast("string").as("group_key")), "node")
    val inGroup = Window.partitionBy("group_key")
      .orderBy(col("score").desc, col("node").asc)
    val byKey = Window.orderBy(col("group_key").asc)
    keyed
      .withColumn("rn", row_number().over(inGroup))
      .withColumn("gr", dense_rank().over(byKey))
      .filter(col("rn") <= groupSize && col("gr") <= groupLimit)
      .select(col("group_key"), col("node"), col("score"))
  }

  /** SearchBatch (points_service.go:697-726) — the reference loops N
    * independent searches; at scale the right plan is ONE scan: broadcast
    * the literal query batch, score every (point, query) pair in a single
    * pass, window top-k per query. Same DECIMAL cosine as [[search]].
    */
  def searchBatch(points: DataFrame, idCol: String, embCol: String,
      queries: Seq[Seq[Double]], k: Int, filter: Filter = Filter()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = points.sparkSession
    import spark.implicits._
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qv")
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("node").asc)
    points.filter(pred(filter))
      .crossJoin(broadcast(qdf))
      .withColumn("dot", VectorSearch.dotDec(col(embCol), col("qv")))
      .withColumn("na2", VectorSearch.dotDec(col(embCol), col(embCol)))
      .withColumn("nb2", VectorSearch.dotDec(col("qv"), col("qv")))
      .withColumn("score",
        round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 12))
      .select(col("qid"), col(idCol).as("node"), col("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "node", "score")
  }

  // ========================================================= oracles =====

  /** DuckDB replay of [[searchGroups]]. */
  def searchGroupsOracle(queryVec: Seq[Double], groupLimit: Int,
      groupSize: Int, dim: Int, filterSql: String = "TRUE"): String = {
    val lits = queryVec.map(v => s"CAST($v AS DOUBLE)").mkString("[", ",", "]")
    s"""
      WITH qv AS (SELECT $lits AS q),
      comp AS (
        SELECT e.vec_id,
          CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
          CAST(SUM(CAST(q[i] * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS nb2
        FROM embeddings e CROSS JOIN qv CROSS JOIN generate_series(1, $dim) t(i)
        WHERE $filterSql
        GROUP BY e.vec_id),
      top AS (
        SELECT vec_id AS node, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS score
        FROM comp ORDER BY score DESC, node LIMIT ${groupLimit * groupSize}),
      keyed AS (
        SELECT CAST(e.label AS VARCHAR) AS group_key, t.node, t.score
        FROM top t JOIN embeddings e ON e.vec_id = t.node),
      r AS (
        SELECT *,
          ROW_NUMBER() OVER (PARTITION BY group_key ORDER BY score DESC, node) AS rn,
          DENSE_RANK() OVER (ORDER BY group_key) AS gr
        FROM keyed)
      SELECT group_key, node, score FROM r
      WHERE rn <= $groupSize AND gr <= $groupLimit"""
  }

  /** DuckDB replay of [[searchBatch]]: one scoring block per query,
    * UNION ALL with the query index tagged.
    */
  def searchBatchOracle(queries: Seq[Seq[Double]], k: Int, dim: Int): String =
    queries.zipWithIndex.map { case (qv, i) =>
      val lits = qv.map(v => s"CAST($v AS DOUBLE)").mkString("[", ",", "]")
      s"""SELECT * FROM (
        WITH qv AS (SELECT $lits AS q),
        comp AS (
          SELECT e.vec_id,
            CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS dot,
            CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
            CAST(SUM(CAST(q[i] * q[i] AS DECIMAL(38,18))) AS DOUBLE) AS nb2
          FROM embeddings e CROSS JOIN qv CROSS JOIN generate_series(1, $dim) t(i)
          GROUP BY e.vec_id)
        SELECT $i AS qid, vec_id AS node,
               round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS score
        FROM comp ORDER BY score DESC, node LIMIT $k)"""
    }.mkString("\n UNION ALL \n")


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
