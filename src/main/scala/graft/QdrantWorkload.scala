package graft

import org.apache.spark.sql.functions._

import graft.search.QdrantPoints
import graft.search.QdrantPoints.Filter

/** The Qdrant points workload as oracle rows — the shape of the
  * reference's published vector benchmark
  * (`testing/benchmarks/nornic_vs_qdrant/README.md`; service semantics
  * `pkg/qdrantgrpc/points_service.go`): payload-filtered search, count
  * with must/mustNot, keyset scroll, and recommend over the embeddings
  * table (`label` is the payload field).
  */
object QdrantWorkload {

  private val dim = 64

  // static literal query vector (the benchmark drives literal vectors)
  private val qv: Seq[Double] =
    (0 until dim).map(i => if (i % 7 == 0) 1.0 else 0.25)

  // recommend examples as literal vectors (the PositiveVectors form)
  private val positives: Seq[Seq[Double]] = Seq(
    (0 until dim).map(i => if (i < 8) 1.0 else 0.0),
    (0 until dim).map(i => if (i >= 8 && i < 16) 1.0 else 0.0))
  private val negatives: Seq[Seq[Double]] = Seq(
    (0 until dim).map(i => if (i >= 16 && i < 24) 1.0 else 0.0))

  val queries: Map[String, GQuery] = Map(
    // filtered search: payload predicate BEFORE the distance computation
    // (the scale-correct ordering; the reference over-fetches ×10 and
    // post-filters, points_service.go:1189-1224)
    "q_qdrant_filtered_search" -> GQuery(
      (s, d) => QdrantPoints.search(Tables.embeddings(s, d), "vec_id",
        "embedding", qv, 10, Filter(must = Seq(col("label") === 1))),
      Some(QdrantPoints.searchOracle(qv, 10, dim, "e.label = 1")), "2.11"),

    // search with must + mustNot + score threshold + offset page
    "q_qdrant_search_paged" -> GQuery(
      (s, d) => QdrantPoints.search(Tables.embeddings(s, d), "vec_id",
        "embedding", qv, 10,
        Filter(must = Seq(col("label") >= 1), mustNot = Seq(col("vec_id") < 10)),
        minScore = Some(0.0), offset = 5),
      Some(QdrantPoints.searchOracle(qv, 10, dim,
        "e.label >= 1 AND NOT e.vec_id < 10", Some(0.0), 5)), "2.11"),

    // CountPoints with a filter
    "q_qdrant_count" -> GQuery(
      (s, d) => QdrantPoints.countPoints(Tables.embeddings(s, d),
        Filter(must = Seq(col("label") >= 1), mustNot = Seq(col("vec_id") < 10))),
      Some("""SELECT count(*) AS count FROM embeddings
              WHERE label >= 1 AND NOT vec_id < 10"""), "2.11"),

    // ScrollPoints: keyset pagination (no deep OFFSET at scale)
    "q_qdrant_scroll" -> GQuery(
      (s, d) => QdrantPoints.scroll(Tables.embeddings(s, d), "vec_id",
        Filter(must = Seq(col("label") === 0)), afterId = Some(100L), limit = 10),
      Some("""SELECT vec_id FROM embeddings
              WHERE label = 0 AND vec_id > 100
              ORDER BY vec_id LIMIT 10"""), "2.11"),

    // SearchGroups: oversampled global top → grouped by payload key,
    // key-ordered groups, trimmed per group (points_service.go:804-880)
    "q_qdrant_search_groups" -> GQuery(
      (s, d) => QdrantPoints.searchGroups(Tables.embeddings(s, d), "vec_id",
        "embedding", qv, "label", groupLimit = 2, groupSize = 3),
      Some(QdrantPoints.searchGroupsOracle(qv, 2, 3, dim)), "2.11"),

    // SearchBatch: the reference loops N searches; here ONE scan scores
    // the broadcast query batch and windows top-k per query
    "q_qdrant_search_batch" -> GQuery(
      (s, d) => QdrantPoints.searchBatch(Tables.embeddings(s, d), "vec_id",
        "embedding", Seq(qv, positives.head, negatives.head), 5),
      Some(QdrantPoints.searchBatchOracle(
        Seq(qv, positives.head, negatives.head), 5, dim)), "2.11"),

    // Recommend: query = avg(positives) − avg(negatives), literal-vector
    // form; same oracle machinery with the combined vector
    "q_qdrant_recommend" -> GQuery(
      (s, d) => QdrantPoints.recommend(Tables.embeddings(s, d), "vec_id",
        "embedding", positives, negatives, 10),
      Some(QdrantPoints.searchOracle(
        QdrantPoints.recommendVector(positives, negatives), 10, dim)), "2.11"))
}
