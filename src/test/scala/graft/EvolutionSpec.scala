package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Evolution

/** Temporal-evolution trio (`pkg/temporal/{relationship_evolution,session,
  * query_load}.go`): the codegen'd column fold must agree EXACTLY with the
  * pure-Scala KalmanVelocity twin, and the three registry queries must
  * satisfy the reference's structural invariants.
  */
class EvolutionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("column fold matches the pure-Scala KalmanVelocity bit-for-bit") {
    val series = Seq(
      Seq(1.0, 2.0, 3.0, 4.0, 5.0),                       // perfect ramp
      Seq(170.03, 73.24, 26.34, 31.05, 215.08),           // noisy
      Seq(10.0),                                          // single obs
      Seq.empty[Double],                                  // no obs → zero state
      Seq.fill(50)(1.0))                                  // constant co-access
    for (cfg <- Seq(Evolution.RelationshipFilter, Evolution.TemporalTracking,
        Evolution.LoadFilter)) {
      val df = series.zipWithIndex.toDF("zs", "id")
        .select(col("id"), Evolution.kvFoldCol(col("zs"), cfg).as("st"))
        .select(col("id"), col("st.pos"), col("st.vel"), col("st.p00"),
          col("st.p01"), col("st.p10"), col("st.p11"))
        .collect().map(r => r.getInt(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
      series.zipWithIndex.foreach { case (zs, i) =>
        val e = Evolution.kvProcess(zs, cfg)
        assert(df(i) === ((e.pos, e.vel, e.p00, e.p01, e.p10, e.p11)),
          s"cfg=$cfg series=$i")
      }
    }
  }

  test("constant measurements converge: position → measurement, velocity → 0") {
    val st = Evolution.kvProcess(Seq.fill(200)(7.5), Evolution.RelationshipFilter)
    assert(math.abs(st.pos - 7.5) < 0.01)
    assert(math.abs(st.vel) < 0.01)
  }

  test("linear ramp: velocity converges to the slope") {
    val st = Evolution.kvProcess((1 to 200).map(_ * 2.0), Evolution.RelationshipFilter)
    assert(math.abs(st.vel - 2.0) < 0.05)
  }

  test("relationshipTrends: direction thresholds and confidence formula") {
    val rows = EvolutionQueries.queries("q_evolution_trends").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_obs")
      val v = r.getAs[Double]("velocity")
      val dir = r.getAs[String]("direction")
      if (n < 3) assert(dir === "unknown")
      else if (v > 0.01) assert(dir === "strengthening")
      else if (v < -0.01) assert(dir === "weakening")
      else assert(dir === "stable")
      val conf = r.getAs[Double]("confidence")
      assert(math.abs(conf - n.toDouble / (n + 10)) < 1e-8)
      // Predict(5) = pos + 5*vel (query_load.go Predict shape, dt = 1)
      assert(math.abs(r.getAs[Double]("predicted_strength") -
        (r.getAs[Double]("current_strength") + 5 * v)) < 2e-8)
    }
  }

  test("sessionStats: break-reason counts partition the session starts") {
    val rows = EvolutionQueries.queries("q_evolution_sessions").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_sessions")
      val breaks = r.getAs[Long]("n_time_gap") +
        r.getAs[Long]("n_velocity_change") + r.getAs[Long]("n_max_duration")
      // first access opens a session; every counted break opens another
      assert(ns === 1 + breaks, s"user ${r.getAs[Long]("user_id")}")
      assert(ns <= r.getAs[Long]("n_accesses"))
    }
  }

  test("sessionStats: crafted gaps split sessions the way processAccess does") {
    // 4 accesses 1s apart (one session), then a 400s gap (time_gap break)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Double) = new java.sql.Timestamp(base.getTime + (s * 1000).toLong)
    val events = Seq(
      (1L, at(0), 9L, "view", 1.0, "{}"),
      (2L, at(1), 9L, "view", 1.0, "{}"),
      (3L, at(2), 9L, "view", 1.0, "{}"),
      (4L, at(3), 9L, "view", 1.0, "{}"),
      (5L, at(403), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Evolution.sessionStats(events).collect().head
    assert(r.getAs[Long]("n_accesses") === 5)
    // the 400s gap breaks the session — attributed to velocity_change, not
    // time_gap: the reference's reason cascade (session.go:217-228) lets
    // the rate collapse (1.0 → 0.0025, |Δv/v| ≫ 0.5) override "time_gap"
    assert(r.getAs[Long]("n_sessions") >= 2)
    assert(r.getAs[Long]("n_time_gap") + r.getAs[Long]("n_velocity_change") >= 1)
    assert(r.getAs[Long]("n_sessions") ===
      1 + r.getAs[Long]("n_time_gap") + r.getAs[Long]("n_velocity_change") +
        r.getAs[Long]("n_max_duration"))
  }

  test("loadPrediction: one row, consistent trend/prediction/level fields") {
    val r = EvolutionQueries.queries("q_evolution_load").fn(spark, sf).collect() match {
      case Array(only) => only
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    val pos = r.getAs[Double]("current_qps")
    val vel = r.getAs[Double]("velocity")
    val trend = r.getAs[String]("trend")
    if (vel > 0.5) assert(trend === "increasing")
    else if (vel < -0.5) assert(trend === "decreasing")
    else assert(trend === "stable")
    // predictions are clamped at zero and consistent with pos + vel*steps
    for ((colName, steps) <- Seq(("pred_qps_5m", 300.0), ("pred_qps_15m", 900.0),
        ("pred_qps_1h", 3600.0))) {
      val p = r.getAs[Double](colName)
      assert(p >= 0.0)
      assert(math.abs(p - math.max(pos + vel * steps, 0.0)) < 2e-8, colName)
    }
    assert(r.getAs[Long]("total_queries") > 0)
    assert(r.getAs[Int]("peak_hour") >= 0 && r.getAs[Int]("peak_hour") <= 23)
    assert(Set(0, 1, 2, 3, 4, 5).contains(r.getAs[Int]("load_level")))
  }
}
