package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.QdrantPoints
import graft.search.QdrantPoints.Filter

/** Qdrant points semantics (points_service.go): filter combination rules,
  * pre-distance predicate pushdown (the scale claim), keyset scroll, and
  * the recommend vector formula.
  */
class QdrantSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("filter: must AND, mustNot NONE, should ANY") {
    val f = Filter(
      must = Seq(col("label") >= 0),
      mustNot = Seq(col("vec_id") === 1L, col("vec_id") === 2L),
      should = Seq(col("vec_id") === 3L, col("vec_id") === 4L))
    val ids = emb.filter(QdrantPoints.pred(f))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L, 4L))
  }

  test("filtered search applies the predicate BEFORE the distance computation") {
    val qv = (0 until 64).map(_ => 1.0)
    val df = QdrantPoints.search(emb, "vec_id", "embedding", qv, 5,
      Filter(must = Seq(col("label") === 1)))
    // the physical plan filters the scan side — no result row can carry a
    // non-matching label, and the plan's Filter sits under the sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("label"), "payload predicate missing from the plan")
    val hits = df.collect().map(_.getLong(0)).toSet
    val labels = emb.filter(col("vec_id").isin(hits.toSeq: _*))
      .select("label").collect().map(_.getInt(0)).toSet
    assert(labels == Set(1))
  }

  test("scroll is keyset pagination: strictly-after ids, ordered, bounded") {
    val p1 = QdrantPoints.scroll(emb, "vec_id", limit = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == p1.sorted && p1.length == 5)
    val p2 = QdrantPoints.scroll(emb, "vec_id", afterId = Some(p1.last), limit = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(p2.head > p1.last && p2.length == 5)
  }

  test("recommend vector = avg(pos) - avg(neg); positives required") {
    val v = QdrantPoints.recommendVector(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(Seq(2.0, 2.0)))
    assert(v == Seq(-1.5, -1.5))
    assert(QdrantPoints.recommendVector(Seq(Seq(1.0, 2.0)), Nil) == Seq(1.0, 2.0))
    intercept[IllegalArgumentException] {
      QdrantPoints.recommendVector(Nil, Seq(Seq(1.0)))
    }
  }

  test("searchGroups: key-ordered groups, trimmed to groupSize, from the oversample") {
    val qv = (0 until 64).map(_ => 1.0)
    val rows = QdrantPoints.searchGroups(emb, "vec_id", "embedding", qv,
      "label", groupLimit = 2, groupSize = 3).collect()
    val keys = rows.map(_.getString(0)).distinct.sorted
    assert(keys.length <= 2)
    // groups are the first groupLimit keys in sorted order
    assert(keys === keys.sorted)
    // ≤ groupSize hits per group, each group's hits in score-desc order
    rows.groupBy(_.getString(0)).foreach { case (_, hits) =>
      assert(hits.length <= 3)
      val scores = hits.map(_.getDouble(2)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("searchBatch: one-scan batch equals per-query search") {
    val q1 = (0 until 64).map(_ => 1.0)
    val q2 = (0 until 64).map(i => if (i < 8) 1.0 else 0.0)
    val batch = QdrantPoints.searchBatch(emb, "vec_id", "embedding",
      Seq(q1, q2), 5).collect()
    val single1 = QdrantPoints.search(emb, "vec_id", "embedding", q1, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got1 = batch.filter(_.getInt(0) == 0)
      .sortBy(r => (-r.getDouble(2), r.getLong(1)))
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got1 === single1)
    assert(batch.count(_.getInt(0) == 1) === 5)
  }

  test("score threshold applies after ranking (ScoreThreshold semantics)") {
    val qv = (0 until 64).map(_ => 1.0)
    val all = QdrantPoints.search(emb, "vec_id", "embedding", qv, 10)
      .collect()
    val thr = all(4).getDouble(1) // 5th best score as threshold
    val cut = QdrantPoints.search(emb, "vec_id", "embedding", qv, 10,
      minScore = Some(thr)).collect()
    assert(cut.length == 5 && cut.forall(_.getDouble(1) >= thr))
  }
}
