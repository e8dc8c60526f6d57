package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal evolution tracking — the three `pkg/temporal` components built
  * on the reference's 2-state (position, velocity) Kalman filter
  * (`/root/reference/pkg/filter/kalman_velocity.go:155-208`):
  *
  *  - [[relationshipTrends]]: edge-weight trend tracking
  *    (`pkg/temporal/relationship_evolution.go` — strengthening/weakening/
  *    stable direction, 5-step strength prediction, n/(n+10) confidence).
  *  - [[sessionStats]]: session-boundary detection per entity
  *    (`pkg/temporal/session.go:198-271` — time-gap, velocity-change and
  *    max-duration breaks, with the reference's reason-override cascade).
  *  - [[loadPrediction]]: query-load trend + anomaly prediction
  *    (`pkg/temporal/query_load.go:261-412` — bucketed QPS through the
  *    filter, spike/drop trend, 5m/15m/1h predictions, rolling-window
  *    anomaly baseline, scale-up/down advice, peak hour).
  *
  * The reference mutates one in-heap tracker per edge/node under a mutex;
  * here each tracker is a per-key ORDERED FOLD: group → sorted observation
  * array → one codegen'd `aggregate` pass carrying the full filter state
  * (pos, vel, 2x2 covariance) as a struct. Keys partition across the
  * cluster, each series folds locally — the 100 TB shape. All arithmetic is
  * written in the exact IEEE operation order of `processInternal` (with the
  * reference's universal Dt = 1.0) so the DuckDB `list_reduce` replay in
  * [[graft.EvolutionQueries]] hash-matches bit-for-bit.
  */
object Evolution {

  /** VelocityConfig subset (Dt is 1.0 in every reference preset). */
  final case class KvConfig(qPos: Double, qVel: Double, r: Double,
      p00: Double, p11: Double)

  /** DefaultRelationshipConfig().FilterConfig (relationship_evolution.go:127). */
  val RelationshipFilter: KvConfig = KvConfig(0.01, 0.001, 0.1, 1.0, 0.1)
  /** filter.TemporalTrackingConfig() (kalman_velocity.go:76-85). */
  val TemporalTracking: KvConfig = KvConfig(0.05, 0.005, 0.5, 50.0, 5.0)
  /** DefaultLoadConfig().FilterConfig (query_load.go:149-160). */
  val LoadFilter: KvConfig = KvConfig(0.5, 0.1, 2.0, 100.0, 10.0)

  // ---- pure-Scala twin (spec oracle for the column fold) ----

  final case class KvState(pos: Double, vel: Double,
      p00: Double, p01: Double, p10: Double, p11: Double)

  def kvInit(cfg: KvConfig): KvState = KvState(0.0, 0.0, cfg.p00, 0.0, 0.0, cfg.p11)

  /** One predict+update step — kalman_velocity.go:162-208 with dt = 1. */
  def kvStep(s: KvState, z: Double, cfg: KvConfig): KvState = {
    val predPos = s.pos + s.vel
    val predP00 = s.p00 + s.p10 + s.p01 + s.p11 + cfg.qPos
    val predP01 = s.p01 + s.p11
    val predP10 = s.p10 + s.p11
    val predP11 = s.p11 + cfg.qVel
    val innov = z - predPos
    val sInn = predP00 + cfg.r
    val k0 = predP00 / sInn
    val k1 = predP10 / sInn
    KvState(
      pos = predPos + k0 * innov,
      vel = s.vel + k1 * innov,
      p00 = (1.0 - k0) * predP00,
      p01 = (1.0 - k0) * predP01,
      p10 = predP10 - k1 * predP00,
      p11 = predP11 - k1 * predP01)
  }

  def kvProcess(zs: Seq[Double], cfg: KvConfig): KvState =
    zs.foldLeft(kvInit(cfg))((s, z) => kvStep(s, z, cfg))

  // ---- column fold ----

  def kvZeroCol(cfg: KvConfig): Column = struct(
    lit(0.0).as("pos"), lit(0.0).as("vel"),
    lit(cfg.p00).as("p00"), lit(0.0).as("p01"),
    lit(0.0).as("p10"), lit(cfg.p11).as("p11"))

  /** The six updated filter fields for measurement `z` — identical
    * operation order to [[kvStep]] (and to the SQL replay template).
    */
  def kvStepCol(s: Column, z: Column, cfg: KvConfig): Column = {
    val predPos = s.getField("pos") + s.getField("vel")
    val predP00 = s.getField("p00") + s.getField("p10") +
      s.getField("p01") + s.getField("p11") + lit(cfg.qPos)
    val predP01 = s.getField("p01") + s.getField("p11")
    val predP10 = s.getField("p10") + s.getField("p11")
    val predP11 = s.getField("p11") + lit(cfg.qVel)
    val innov = z - predPos
    val sInn = predP00 + lit(cfg.r)
    val k0 = predP00 / sInn
    val k1 = predP10 / sInn
    struct(
      (predPos + k0 * innov).as("pos"),
      (s.getField("vel") + k1 * innov).as("vel"),
      ((lit(1.0) - k0) * predP00).as("p00"),
      ((lit(1.0) - k0) * predP01).as("p01"),
      (predP10 - k1 * predP00).as("p10"),
      (predP11 - k1 * predP01).as("p11"))
  }

  /** Fold an ordered ARRAY<DOUBLE> of measurements through the filter. */
  def kvFoldCol(series: Column, cfg: KvConfig): Column =
    aggregate(series, kvZeroCol(cfg), (s, z) => kvStepCol(s, z, cfg))

  // ---- 1. relationship evolution ----

  /** Edge-weight trends over co-access observations. Edges here are
    * (user → event_type) access relationships, weight = the event's value
    * (RecordCoAccess's weighted form, relationship_evolution.go:199); each
    * edge's chronological weight series folds through the relationship
    * filter. Outputs mirror `RelationshipTrend` / `calculateTrend`
    * (relationship_evolution.go:259-290): direction against the
    * ±`strengthen`/`weaken` velocity thresholds ("unknown" below `minObs`),
    * 5-step prediction pos + 5·vel, confidence n/(n+10).
    */
  def relationshipTrends(events: DataFrame, minObs: Int = 3,
      strengthen: Double = 0.01, weaken: Double = -0.01): DataFrame = {
    val obs = events
      .groupBy(concat(lit("User:"), col("user_id")).as("src"),
        col("event_type").as("tgt"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col("ts")).as("ord"),
        col("event_id").as("eid"),
        col("value").as("z")))).as("obs"))
    val n = size(col("obs"))
    obs
      .withColumn("st", kvFoldCol(transform(col("obs"), e => e.getField("z")),
        RelationshipFilter))
      .select(
        col("src"), col("tgt"),
        n.cast("int").as("n_obs"),
        when(n < minObs, "unknown")
          .when(col("st.vel") > strengthen, "strengthening")
          .when(col("st.vel") < weaken, "weakening")
          .otherwise("stable").as("direction"),
        round(col("st.vel"), 9).as("velocity"),
        round(col("st.pos"), 9).as("current_strength"),
        round(col("st.pos") + col("st.vel") * lit(5.0), 9).as("predicted_strength"),
        round(n.cast("double") / (n + lit(10)).cast("double"), 9).as("confidence"))
  }

  // ---- 2. session detection ----

  /** Per-entity session statistics — the batch replay of
    * `SessionDetector.processAccess` (session.go:198-271) over each
    * user's ordered accesses: the first access starts a session; each
    * later access computes gap → access rate (1/gap, 1000 when gap <
    * 1 ms) → one filter step, then breaks the session on gap >
    * `gapSeconds`, relative velocity change beyond `velChange` (only once
    * lastVelocity ≠ 0), or session duration > `maxDurSeconds` — with the
    * reference's reason override order (max_duration beats
    * velocity_change beats time_gap). Returns per-user counts per break
    * reason plus the final filtered access-rate velocity.
    */
  def sessionStats(events: DataFrame,
      gapSeconds: Double = 300.0, velChange: Double = 0.5,
      maxDurSeconds: Double = 7200.0): DataFrame = {
    val cfg = TemporalTracking
    val zero = struct(
      lit(0.0).as("pos"), lit(0.0).as("vel"),
      lit(cfg.p00).as("p00"), lit(0.0).as("p01"),
      lit(0.0).as("p10"), lit(cfg.p11).as("p11"),
      lit(0.0).as("tl"), lit(0.0).as("vl"), lit(0.0).as("ss"),
      lit(0.0).as("ns"), lit(0.0).as("ng"), lit(0.0).as("nv"),
      lit(0.0).as("nd"), lit(0.0).as("n"))
    def step(s: Column, t: Column): Column = {
      val initSt = struct(
        lit(0.0).as("pos"), lit(0.0).as("vel"),
        lit(cfg.p00).as("p00"), lit(0.0).as("p01"),
        lit(0.0).as("p10"), lit(cfg.p11).as("p11"),
        t.as("tl"), lit(0.0).as("vl"), t.as("ss"),
        lit(1.0).as("ns"), lit(0.0).as("ng"), lit(0.0).as("nv"),
        lit(0.0).as("nd"), lit(1.0).as("n"))
      val gap = t - s.getField("tl")
      val rate = when(gap < 0.001, lit(1000.0)).otherwise(lit(1.0) / gap)
      val k = kvStepCol(s, rate, cfg)
      val v = k.getField("vel")
      val rel = (v - s.getField("vl")) / s.getField("vl")
      val isGap = gap > gapSeconds
      val isVel = (s.getField("vl") =!= 0.0) &&
        (rel > velChange || rel < -velChange)
      val isDur = (t - s.getField("ss")) > maxDurSeconds
      val isNew = isGap || isVel || isDur
      val one = (c: Column) => when(c, 1.0).otherwise(0.0)
      val nextSt = struct(
        k.getField("pos").as("pos"), v.as("vel"),
        k.getField("p00").as("p00"), k.getField("p01").as("p01"),
        k.getField("p10").as("p10"), k.getField("p11").as("p11"),
        t.as("tl"), v.as("vl"),
        when(isNew, t).otherwise(s.getField("ss")).as("ss"),
        (s.getField("ns") + one(isNew)).as("ns"),
        (s.getField("ng") + one(isGap && !isVel && !isDur)).as("ng"),
        (s.getField("nv") + one(isVel && !isDur)).as("nv"),
        (s.getField("nd") + one(isDur)).as("nd"),
        (s.getField("n") + lit(1.0)).as("n"))
      when(s.getField("n") === 0.0, initSt).otherwise(nextSt)
    }
    events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col("ts")).as("ord"),
        col("event_id").as("eid")))).as("acc"))
      .withColumn("st", aggregate(
        transform(col("acc"), e => e.getField("ord") / lit(1000000.0)),
        zero, step))
      .select(col("user_id"),
        col("st.n").cast("bigint").as("n_accesses"),
        col("st.ns").cast("bigint").as("n_sessions"),
        col("st.ng").cast("bigint").as("n_time_gap"),
        col("st.nv").cast("bigint").as("n_velocity_change"),
        col("st.nd").cast("bigint").as("n_max_duration"),
        round(col("st.vl"), 9).as("last_velocity"))
  }

  // ---- 3. query-load prediction ----

  /** One-row load prediction over the whole event stream — the batch form
    * of `QueryLoadPredictor` (query_load.go:221-412): events bucket by
    * `bucketSeconds` (epoch truncation); every bucket EXCEPT the last
    * flushes qps = count/bucketSeconds into the load filter in order (the
    * live predictor only flushes a bucket when a later event opens the
    * next one, query_load.go:234-241). Trend thresholds are spike/10 and
    * drop/10; predictions pos + vel·steps clamped at 0; anomaly baseline
    * is mean/stddev over the last 60 flushed buckets (chronological-order
    * sums — the reference iterates its ring buffer in slot order, a
    * rotation of the same 60 values; documented deviation), gated on > 5
    * samples; peak hour is the argmax of hour-of-day counts with the
    * reference's earliest-hour tie-break; scale-up/down and load level per
    * ShouldScaleUp/ShouldScaleDown/GetLoadLevel (query_load.go:422-474).
    */
  def loadPrediction(events: DataFrame, bucketSeconds: Long = 3600L,
      spike: Double = 5.0, drop: Double = -5.0, anomalyStdDevs: Double = 3.0,
      thresholdQps: Double = 0.003, minQps: Double = 0.0001,
      maxQps: Double = 0.01): DataFrame = {
    val bucketMicros = bucketSeconds * 1000000L
    val buckets = events
      .groupBy(expr(s"unix_micros(ts) div ${bucketMicros}L").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt")))).as("bs"))
      .select(transform(
        slice(col("bs"), lit(1), size(col("bs")) - 1),
        b => b.getField("cnt").cast("double") / lit(bucketSeconds.toDouble))
        .as("qps"))
    val peak = events
      .groupBy(hour(col("ts")).as("h")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("h").asc).limit(1)
      .select(col("h").cast("int").as("peak_hour"))
    val total = events.agg(count(lit(1)).as("total_queries"))

    val st = col("st")
    val pos = st.getField("pos")
    val vel = st.getField("vel")
    val trend = when(vel > spike / 10.0, "increasing")
      .when(vel < drop / 10.0, "decreasing")
      .otherwise("stable")
    def pred(steps: Double): Column = greatest(pos + vel * lit(steps), lit(0.0))
    val ring = slice(col("qps"), greatest(lit(1), size(col("qps")) - 59), lit(60))
    val rn = size(col("ring"))
    val mean = aggregate(col("ring"), lit(0.0), _ + _) / rn.cast("double")
    val sumSq = aggregate(col("ring"), lit(0.0), (a, x) => a + x * x)
    val variance = greatest(sumSq / rn.cast("double") - col("mean") * col("mean"), lit(0.0))
    val std = sqrt(col("variance"))
    val dev = (pos - col("mean")) / col("std")
    val isAnomaly = (col("std") > 0.0 && rn > 5) &&
      (col("dev") > anomalyStdDevs || col("dev") < -anomalyStdDevs)
    val anomalyType = when(!col("is_anom"), "")
      .when(col("dev") > anomalyStdDevs, when(vel > spike, "spike").otherwise("sustained_high"))
      .otherwise(when(vel < drop, "drop").otherwise("sustained_low"))
    val scaleUp = (pos > thresholdQps * 0.8 && col("trend") === "increasing") ||
      col("pred5") > thresholdQps
    val scaleDown = pos < thresholdQps * 0.5 && col("trend") =!= "increasing" &&
      pos > minQps
    val ratio = pos / maxQps
    val loadLevel = when(ratio < 0.1, 0).when(ratio < 0.3, 1).when(ratio < 0.5, 2)
      .when(ratio < 0.7, 3).when(ratio < 0.9, 4).otherwise(5)

    buckets
      .withColumn("st", kvFoldCol(col("qps"), LoadFilter))
      .withColumn("ring", ring)
      .withColumn("mean", mean)
      .withColumn("variance", variance)
      .withColumn("std", std)
      .withColumn("dev", dev)
      .withColumn("is_anom", isAnomaly)
      .withColumn("trend", trend)
      .withColumn("pred5", pred(300.0))
      .crossJoin(broadcast(peak))
      .crossJoin(broadcast(total))
      .select(
        round(pos, 9).as("current_qps"),
        round(vel, 9).as("velocity"),
        col("trend"),
        round(col("pred5"), 9).as("pred_qps_5m"),
        round(pred(900.0), 9).as("pred_qps_15m"),
        round(pred(3600.0), 9).as("pred_qps_1h"),
        col("total_queries"),
        round(col("total_queries").cast("double") /
          (col("total_queries") + lit(1000)).cast("double"), 9).as("confidence"),
        col("peak_hour"),
        col("is_anom").cast("int").as("is_anomaly"),
        anomalyType.as("anomaly_type"),
        scaleUp.cast("int").as("scale_up"),
        scaleDown.cast("int").as("scale_down"),
        loadLevel.cast("int").as("load_level"))
  }
}
