package graft

import graft.streaming.Evolution

/** Registry rows for the `pkg/temporal` evolution trio
  * ([[graft.streaming.Evolution]]): relationship-trend tracking, session
  * detection and query-load prediction. Each oracle replays the 2-state
  * KalmanVelocity fold (`kalman_velocity.go:162-208`, Dt = 1) in DuckDB
  * as a RECURSIVE CTE carrying the full (pos, vel, 2x2 covariance) state
  * as columns — one recursion step per observation, every field computed
  * from the previous row, in the exact IEEE operation order of the Spark
  * fold. (A `list_reduce` struct accumulator — the q_fn_kalman pattern —
  * is NOT safe here: DuckDB 1.0 updates the accumulator struct field by
  * field, so later field expressions observe already-updated earlier
  * fields; the recursive projection has no such hazard.) The SQL step is
  * GENERATED from the same constants as the Scala fold so the two can't
  * drift.
  */
object EvolutionQueries {

  private def d(x: Double): String = s"CAST($x AS DOUBLE)"

  /** The six filter-state updates for measurement `z` — string twin of
    * [[Evolution.kvStepCol]], identical operation order. `acc` is the
    * previous recursion row's alias, `z` the measurement expression.
    */
  private def kvStepFields(cfg: Evolution.KvConfig, acc: String, z: String)
      : Map[String, String] = {
    val predPos = s"($acc.pos + $acc.vel)"
    val predP00 = s"(((($acc.p00 + $acc.p10) + $acc.p01) + $acc.p11) + ${d(cfg.qPos)})"
    val predP01 = s"($acc.p01 + $acc.p11)"
    val predP10 = s"($acc.p10 + $acc.p11)"
    val predP11 = s"($acc.p11 + ${d(cfg.qVel)})"
    val innov = s"($z - $predPos)"
    val sInn = s"($predP00 + ${d(cfg.r)})"
    val k0 = s"($predP00 / $sInn)"
    val k1 = s"($predP10 / $sInn)"
    Map(
      "pos" -> s"($predPos + $k0 * $innov)",
      "vel" -> s"($acc.vel + $k1 * $innov)",
      "p00" -> s"((${d(1.0)} - $k0) * $predP00)",
      "p01" -> s"((${d(1.0)} - $k0) * $predP01)",
      "p10" -> s"($predP10 - $k1 * $predP00)",
      "p11" -> s"($predP11 - $k1 * $predP01)")
  }

  private def relationshipOracle: String = {
    val cfg = Evolution.RelationshipFilter
    val f = kvStepFields(cfg, "r", "s.zs[r.i + 1]")
    s"""WITH RECURSIVE s AS (
         SELECT 'User:' || user_id AS src, event_type AS tgt,
                list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS zs
         FROM events GROUP BY 1, 2),
       r AS (
         SELECT src, tgt, 0 AS i,
                ${d(0.0)} AS pos, ${d(0.0)} AS vel,
                ${d(cfg.p00)} AS p00, ${d(0.0)} AS p01,
                ${d(0.0)} AS p10, ${d(cfg.p11)} AS p11
         FROM s
         UNION ALL
         SELECT r.src, r.tgt, r.i + 1,
                ${f("pos")}, ${f("vel")}, ${f("p00")},
                ${f("p01")}, ${f("p10")}, ${f("p11")}
         FROM r JOIN s ON r.src = s.src AND r.tgt = s.tgt
         WHERE r.i < len(s.zs)),
       fin AS (
         SELECT r.src, r.tgt, len(s.zs) AS n, r.pos, r.vel
         FROM r JOIN s ON r.src = s.src AND r.tgt = s.tgt
         WHERE r.i = len(s.zs))
       SELECT src, tgt, CAST(n AS INT) AS n_obs,
         CASE WHEN n < 3 THEN 'unknown'
              WHEN vel > ${d(0.01)} THEN 'strengthening'
              WHEN vel < ${d(-0.01)} THEN 'weakening'
              ELSE 'stable' END AS direction,
         round(vel, 9) AS velocity,
         round(pos, 9) AS current_strength,
         round(pos + vel * ${d(5.0)}, 9) AS predicted_strength,
         round(CAST(n AS DOUBLE) / CAST(n + 10 AS DOUBLE), 9) AS confidence
       FROM fin"""
  }

  private def sessionOracle: String = {
    val cfg = Evolution.TemporalTracking
    val zS = "s.tsx[r.i + 1]"
    val gap = s"($zS - r.tl)"
    val rate = s"(CASE WHEN $gap < ${d(0.001)} THEN ${d(1000.0)} ELSE ${d(1.0)} / $gap END)"
    val f = kvStepFields(cfg, "r", rate)
    val vNew = f("vel")
    val rel = s"(($vNew - r.vl) / r.vl)"
    val isGap = s"($gap > ${d(300.0)})"
    val isVel = s"(r.vl <> ${d(0.0)} AND ($rel > ${d(0.5)} OR $rel < ${d(-0.5)}))"
    val isDur = s"(($zS - r.ss) > ${d(7200.0)})"
    val isNew = s"($isGap OR $isVel OR $isDur)"
    def one(c: String) = s"(CASE WHEN $c THEN 1 ELSE 0 END)"
    // anchor = state after the first access (session.go:240-247: session
    // starts, the filter is NOT stepped, lastVelocity stays 0)
    s"""WITH RECURSIVE s AS (
         SELECT user_id,
                list(epoch_us(ts) / ${d(1000000.0)} ORDER BY ts, event_id) AS tsx
         FROM events GROUP BY 1),
       r AS (
         SELECT user_id, 1 AS i,
                ${d(0.0)} AS pos, ${d(0.0)} AS vel,
                ${d(cfg.p00)} AS p00, ${d(0.0)} AS p01,
                ${d(0.0)} AS p10, ${d(cfg.p11)} AS p11,
                tsx[1] AS tl, ${d(0.0)} AS vl, tsx[1] AS ss,
                1 AS ns, 0 AS ng, 0 AS nv, 0 AS nd
         FROM s
         UNION ALL
         SELECT r.user_id, r.i + 1,
                ${f("pos")}, $vNew, ${f("p00")}, ${f("p01")}, ${f("p10")}, ${f("p11")},
                $zS, $vNew,
                CASE WHEN $isNew THEN $zS ELSE r.ss END,
                r.ns + ${one(isNew)},
                r.ng + ${one(s"($isGap AND NOT $isVel AND NOT $isDur)")},
                r.nv + ${one(s"($isVel AND NOT $isDur)")},
                r.nd + ${one(isDur)}
         FROM r JOIN s ON r.user_id = s.user_id
         WHERE r.i < len(s.tsx))
       SELECT r.user_id,
         CAST(len(s.tsx) AS BIGINT) AS n_accesses,
         CAST(r.ns AS BIGINT) AS n_sessions,
         CAST(r.ng AS BIGINT) AS n_time_gap,
         CAST(r.nv AS BIGINT) AS n_velocity_change,
         CAST(r.nd AS BIGINT) AS n_max_duration,
         round(r.vl, 9) AS last_velocity
       FROM r JOIN s ON r.user_id = s.user_id
       WHERE r.i = len(s.tsx)"""
  }

  private def loadOracle: String = {
    val cfg = Evolution.LoadFilter
    val bucketSeconds = 3600L
    val spike = 5.0; val drop = -5.0; val anomalyStdDevs = 3.0
    val thresholdQps = 0.003; val minQps = 0.0001; val maxQps = 0.01
    val f = kvStepFields(cfg, "r", "q2.qps[r.i + 1]")
    s"""WITH RECURSIVE b AS (
         SELECT epoch_us(ts) // ${bucketSeconds * 1000000L} AS bucket, COUNT(*) AS c
         FROM events GROUP BY 1),
       q AS (SELECT list(CAST(c AS DOUBLE) / ${d(bucketSeconds.toDouble)} ORDER BY bucket)
               AS qps0 FROM b),
       q2 AS (SELECT qps0[1:len(qps0) - 1] AS qps FROM q),
       r AS (
         SELECT 0 AS i, ${d(0.0)} AS pos, ${d(0.0)} AS vel,
                ${d(cfg.p00)} AS p00, ${d(0.0)} AS p01,
                ${d(0.0)} AS p10, ${d(cfg.p11)} AS p11
         FROM q2
         UNION ALL
         SELECT r.i + 1, ${f("pos")}, ${f("vel")}, ${f("p00")},
                ${f("p01")}, ${f("p10")}, ${f("p11")}
         FROM r, q2 WHERE r.i < len(q2.qps)),
       fin AS (SELECT pos, vel FROM r, q2 WHERE r.i = len(q2.qps)),
       rg AS (SELECT qps[greatest(1, len(qps) - 59):len(qps)] AS ring FROM q2),
       g AS (
         SELECT len(ring) AS rn,
                list_reduce(ring, (a, x) -> a + x) / CAST(len(ring) AS DOUBLE) AS mean,
                list_reduce(list_transform(ring, x -> x * x), (a, x) -> a + x) AS sumsq
         FROM rg),
       h AS (
         SELECT rn, mean,
                sqrt(greatest(sumsq / CAST(rn AS DOUBLE) - mean * mean, ${d(0.0)})) AS std
         FROM g),
       i AS (
         SELECT rn, mean, std, (fin.pos - mean) / std AS dev, fin.pos AS pos, fin.vel AS vel,
                CASE WHEN fin.vel > ${d(spike / 10.0)} THEN 'increasing'
                     WHEN fin.vel < ${d(drop / 10.0)} THEN 'decreasing'
                     ELSE 'stable' END AS trend,
                greatest(fin.pos + fin.vel * ${d(300.0)}, ${d(0.0)}) AS pred5
         FROM h, fin),
       j AS (
         SELECT *,
                (std > ${d(0.0)} AND rn > 5 AND
                 (dev > ${d(anomalyStdDevs)} OR dev < ${d(-anomalyStdDevs)})) AS is_anom
         FROM i),
       pk AS (SELECT CAST(hour(ts) AS INT) AS peak_hour FROM events
              GROUP BY 1 ORDER BY COUNT(*) DESC, 1 ASC LIMIT 1),
       tt AS (SELECT COUNT(*) AS total_queries FROM events)
       SELECT
         round(pos, 9) AS current_qps,
         round(vel, 9) AS velocity,
         trend,
         round(pred5, 9) AS pred_qps_5m,
         round(greatest(pos + vel * ${d(900.0)}, ${d(0.0)}), 9) AS pred_qps_15m,
         round(greatest(pos + vel * ${d(3600.0)}, ${d(0.0)}), 9) AS pred_qps_1h,
         total_queries,
         round(CAST(total_queries AS DOUBLE) / CAST(total_queries + 1000 AS DOUBLE), 9)
           AS confidence,
         peak_hour,
         CAST(is_anom AS INT) AS is_anomaly,
         CASE WHEN NOT is_anom THEN ''
              WHEN dev > ${d(anomalyStdDevs)} THEN
                CASE WHEN vel > ${d(spike)} THEN 'spike' ELSE 'sustained_high' END
              ELSE
                CASE WHEN vel < ${d(drop)} THEN 'drop' ELSE 'sustained_low' END
         END AS anomaly_type,
         CAST(((pos > ${d(thresholdQps * 0.8)} AND trend = 'increasing')
               OR pred5 > ${d(thresholdQps)}) AS INT) AS scale_up,
         CAST((pos < ${d(thresholdQps * 0.5)} AND trend <> 'increasing'
               AND pos > ${d(minQps)}) AS INT) AS scale_down,
         CASE WHEN pos / ${d(maxQps)} < ${d(0.1)} THEN 0
              WHEN pos / ${d(maxQps)} < ${d(0.3)} THEN 1
              WHEN pos / ${d(maxQps)} < ${d(0.5)} THEN 2
              WHEN pos / ${d(maxQps)} < ${d(0.7)} THEN 3
              WHEN pos / ${d(maxQps)} < ${d(0.9)} THEN 4
              ELSE 5 END AS load_level
       FROM j CROSS JOIN pk CROSS JOIN tt"""
  }

  lazy val queries: Map[String, GQuery] = Map(
    "q_evolution_trends" -> GQuery(
      (s, dir) => Evolution.relationshipTrends(Tables.events(s, dir)),
      Some(relationshipOracle), "2.12"),
    "q_evolution_sessions" -> GQuery(
      (s, dir) => Evolution.sessionStats(Tables.events(s, dir)),
      Some(sessionOracle), "2.12"),
    "q_evolution_load" -> GQuery(
      (s, dir) => Evolution.loadPrediction(Tables.events(s, dir)),
      Some(loadOracle), "2.12"))
}
