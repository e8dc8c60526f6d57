package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cyclic access-pattern detection over the events stream — the batch,
  * whole-table form of the reference's per-node `PatternDetector`
  * (`/root/reference/pkg/temporal/pattern_detector.go:200-342`): daily /
  * weekly concentration patterns, burst detection, and Kalman-velocity
  * growth/decay trends, with the reference's exact confidence formulas and
  * default thresholds (`pattern_detector.go:86`).
  *
  * The reference updates one node's histograms per access; at 100 TB the
  * same histograms are ONE grouped aggregation with 24 + 7 conditional
  * sums — no per-entity state, no shuffle beyond the single groupBy.
  * "Now" (burst anchoring) is the batch's max timestamp rather than
  * wall-clock, so results are deterministic and oracle-checkable.
  */
object TemporalPatterns {

  final case class Config(
      minSamples: Int = 10,              // MinSamplesForPattern
      dailyThreshold: Double = 0.3,      // DailyConfidenceThreshold
      weeklyThreshold: Double = 0.4,     // WeeklyConfidenceThreshold
      burstWindowSeconds: Double = 60.0, // BurstWindowSeconds
      burstMinAccesses: Int = 5,         // BurstMinAccesses
      growthThreshold: Double = 0.05,    // GrowthThreshold
      decayThreshold: Double = -0.05)    // DecayThreshold

  private def clamp01(c: Column): Column = greatest(least(c, lit(1.0)), lit(0.0))

  /** Daily + weekly + burst patterns per entity (`user_id`). Returns
    * (entity, pattern, confidence, peak_hour, peak_day, period) — one row
    * per detected pattern, mirroring `DetectedPattern`.
    */
  def detect(events: DataFrame, cfg: Config = Config()): DataFrame = {
    // histograms as 24 + 7 conditional sums in ONE aggregation.
    // hour-of-day 0-23; day-of-week 0=Sunday..6 (Go's time.Weekday;
    // Spark's dayofweek is 1=Sunday..7)
    val hourCols = (0 until 24).map(h =>
      sum(when(hour(col("ts")) === h, 1L).otherwise(0L)).as(s"h$h"))
    val dayCols = (0 until 7).map(d =>
      sum(when(dayofweek(col("ts")) - 1 === d, 1L).otherwise(0L)).as(s"d$d"))
    val now = events.agg(max(unix_timestamp(col("ts"))).as("now_s"))
    val aggs: Seq[Column] =
      count(lit(1)).as("total") +:
        sum(when(unix_timestamp(col("ts")) >
          col("now_s") - cfg.burstWindowSeconds, 1L).otherwise(0L)).as("in_window") +:
        (hourCols ++ dayCols)
    val agg = events
      .crossJoin(broadcast(now))
      .groupBy(col("user_id").as("entity"))
      .agg(aggs.head, aggs.tail: _*)

    val hourArr = array((0 until 24).map(h => col(s"h$h")): _*)
    val dayArr = array((0 until 7).map(d => col(s"d$d")): _*)
    val base = agg
      .withColumn("max_h", array_max(hourArr))
      .withColumn("peak_hour", (array_position(hourArr, array_max(hourArr)) - 1).cast("int"))
      .withColumn("max_d", array_max(dayArr))
      .withColumn("peak_day", (array_position(dayArr, array_max(dayArr)) - 1).cast("int"))
      .withColumn("daily_conf",
        clamp01((col("max_h") / (col("total") / lit(24.0)) - 1.0) / 3.0))
      .withColumn("weekly_conf",
        clamp01((col("max_d") / (col("total") / lit(7.0)) - 1.0) / 2.0))
      .withColumn("burst_conf",
        least(col("in_window") / lit(cfg.burstWindowSeconds) / 10.0, lit(1.0)))
      .filter(col("total") >= cfg.minSamples)

    explodePatterns(base, cfg)
  }

  /** One-pass pattern emission: explode the three candidate patterns from
    * the single aggregated row, filter by each one's threshold — the
    * aggregation is computed ONCE (a 3-way union of filters over the same
    * agg would re-run it per branch without an explicit cache).
    */
  private def explodePatterns(base: DataFrame, cfg: Config): DataFrame =
    base.select(col("entity"), explode(array(
        struct(lit("daily").as("pattern"), col("daily_conf").as("confidence"),
          col("peak_hour").cast("int").as("peak_hour"),
          lit(-1).cast("int").as("peak_day"), lit(86400.0).as("period"),
          (col("daily_conf") >= cfg.dailyThreshold).as("keep")),
        struct(lit("weekly").as("pattern"), col("weekly_conf").as("confidence"),
          lit(-1).cast("int").as("peak_hour"),
          col("peak_day").cast("int").as("peak_day"), lit(604800.0).as("period"),
          (col("weekly_conf") >= cfg.weeklyThreshold).as("keep")),
        struct(lit("burst").as("pattern"), col("burst_conf").as("confidence"),
          lit(-1).cast("int").as("peak_hour"),
          lit(-1).cast("int").as("peak_day"),
          lit(cfg.burstWindowSeconds).as("period"),
          (col("in_window") >= cfg.burstMinAccesses).as("keep")))).as("p"))
      .filter(col("p.keep"))
      .select(col("entity"), col("p.pattern"), col("p.confidence"),
        col("p.peak_hour"), col("p.peak_day"), col("p.period"))

  /** STREAMING form of [[detect]] — the reference's actual shape: the
    * `PatternDetector` updates one node's histograms per access
    * (`pattern_detector.go:117` `RecordAccess`) and detects on demand.
    * Here the per-entity hour/day histograms ride in `GroupState` across
    * micro-batches (`mapGroupsWithState`), and each update emits the
    * entity's current daily/weekly/burst detection. Burst anchors on the
    * entity's own latest access (the reference anchors on wall-clock now —
    * per-entity recency is the deterministic analog). Daily/weekly rows
    * match [[detect]] exactly (same formulas, now-independent).
    */
  def detectStreaming(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      queryName: String, cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

    // epoch seconds from the normalized nanos column (the loader handles
    // both the TIMESTAMP(NANOS)-as-long and timestamp[us] parquet layouts);
    // hour/day-of-week derived UTC like the batch path
    val stream = graft.Tables.eventsStreaming(spark, sfDir)
      .select(col("user_id"), (col("ts_ns") / 1000000000L).cast("long").as("s"))
      .as[(Long, Long)]

    // state: (hour histogram [24], weekday histogram [7], recent-second
    // list for the burst window, max seen second)
    val out = stream.groupByKey(_._1)
      .mapGroupsWithState[(Seq[Long], Seq[Long], Seq[Long], Long),
        (Long, Long, Int, Long, Int, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)],
         state: GroupState[(Seq[Long], Seq[Long], Seq[Long], Long)]) =>
          var (hs, ds, recent, maxS) = state.getOption
            .getOrElse((Seq.fill(24)(0L), Seq.fill(7)(0L), Seq.empty[Long], 0L))
          val hh = hs.toArray; val dd = ds.toArray
          var rec = recent.toList
          it.foreach { case (_, s) =>
            val z = java.time.Instant.ofEpochSecond(s).atZone(java.time.ZoneOffset.UTC)
            hh(z.getHour) += 1
            dd(z.getDayOfWeek.getValue % 7) += 1 // ISO Mon=1..Sun=7 → Go Sun=0
            if (s > maxS) maxS = s
            rec ::= s
          }
          rec = rec.filter(_ > maxS - 60) // only the burst window survives
          state.update((hh.toSeq, dd.toSeq, rec, maxS))
          val total = hh.sum
          val peakH = hh.indexOf(hh.max); val peakD = dd.indexOf(dd.max)
          (uid, total, peakH, hh(peakH), peakD, dd(peakD), rec.size.toLong)
      }
    val q = out.toDF("entity", "total", "peak_hour", "max_h", "peak_day", "max_d", "in_window")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()

    // Update mode emits one row per entity per micro-batch — keep the
    // latest (total is monotone, so max-by-total = last update)
    val latest = spark.table(queryName)
      .groupBy("entity")
      .agg(max(struct(col("total"), col("peak_hour"), col("max_h"),
        col("peak_day"), col("max_d"), col("in_window"))).as("s"))
      .select(col("entity"), col("s.*"))
    val base = latest
      .filter(col("total") >= cfg.minSamples)
      .withColumn("daily_conf",
        clamp01((col("max_h") / (col("total") / lit(24.0)) - 1.0) / 3.0))
      .withColumn("weekly_conf",
        clamp01((col("max_d") / (col("total") / lit(7.0)) - 1.0) / 2.0))
      .withColumn("burst_conf",
        least(col("in_window") / lit(cfg.burstWindowSeconds) / 10.0, lit(1.0)))
    explodePatterns(base, cfg)
  }

  /** Growth/decay trend per entity (`detectTrendPattern`,
    * `pattern_detector.go:323`): the Kalman-velocity fold over the
    * entity's daily access counts; velocity above/below the thresholds
    * reports growing/decaying with confidence min(|v|/0.5, 1).
    */
  def trends(events: DataFrame, cfg: Config = Config()): DataFrame = {
    val daily = events
      .groupBy(col("user_id").as("entity"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val series = daily
      .groupBy("entity")
      .agg(array_sort(collect_list(struct(
        col("day").cast("double").as("t"), col("n").as("z")))).as("tv"))
      .withColumn("kv", graft.functions.KalmanFilter.filterVelocityCol(
        col("tv"), q = 0.01, r = 1.0))
      .select(col("entity"), col("kv.v").as("velocity"))
    series
      .withColumn("pattern",
        when(col("velocity") > cfg.growthThreshold, "growing")
          .when(col("velocity") < cfg.decayThreshold, "decaying"))
      .filter(col("pattern").isNotNull)
      .withColumn("confidence", least(abs(col("velocity")) / 0.5, lit(1.0)))
      .select("entity", "pattern", "confidence", "velocity")
  }
}
