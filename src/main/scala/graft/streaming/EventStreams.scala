package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming/temporal operators over the `events` table (SURVEY §2.12).
  *
  * The window/sessionization logic is expressed with Spark's time-window
  * functions, which run identically in batch and Structured Streaming —
  * the batch form is what the oracle checks; [[streamingTumbling]] runs the
  * SAME aggregation as a real `readStream` with watermark (exercised in
  * StreamingSpec via the memory sink). The reference has no streaming query
  * language; its co-access tracker and decay loop
  * (`/root/reference/pkg/temporal/tracker.go`, `pkg/decay/decay.go:643`)
  * map to these windowed aggregations.
  */
object EventStreams {

  import graft.OracleSafe._

  /** Tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("total"))

  /** Sliding 1-hour windows, 30-minute step. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))

  /** Session windows per user, 30-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total"))

  /** Co-access pairs: event types observed in the same 1-hour bucket
    * (the temporal tracker's co-occurrence shape).
    */
  def coAccessPairs(events: DataFrame): DataFrame = {
    val buckets = events
      .select(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .distinct()
    buckets.toDF("bucket", "ta")
      .join(buckets.toDF("bucket2", "tb"),
        col("bucket") === col("bucket2") && col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_buckets"))
  }

  /** Arbitrary per-key streaming state (SURVEY §2.12
    * `KeyValueGroupedDataset.mapGroupsWithState`): the scalar Kalman filter
    * run as STREAMING state — the reference's "database stays stateless,
    * users maintain state" contract (`kalman_functions.go:22-26`) becomes
    * GroupState carried across micro-batches. Batch-equivalent: the same
    * fold as [[graft.functions.KalmanFilter.filterSeriesCol]], so the
    * result hash-matches the q_fn_kalman DuckDB oracle.
    */
  def streamingKalman(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
    import graft.functions.KalmanFilter

    val stream = graft.Tables.eventsStreaming(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)]

    val out = stream.groupByKey(_._1)
      .mapGroupsWithState[(Double, Double, Long), (Long, Double, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Double)],
         state: GroupState[(Double, Double, Long)]) =>
          // in-batch order is unspecified — sort by (event_id, value), the
          // same key the batch query sorts its collected series by
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          var (x, p, n) = state.getOption.getOrElse((0.0, 1.0, 0L))
          sorted.foreach { case (_, _, z) =>
            if (n == 0) { x = z; p = 1.0; n = 1 }
            else {
              val s2 = KalmanFilter.step(KalmanFilter.State(x, p), z, 0.01, 1.0)
              x = s2.x; p = s2.p; n += 1
            }
          }
          state.update((x, p, n))
          (uid, x, n)
      }
    val q = out.toDF("user_id", "est", "n_obs")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("user_id"), round(col("est"), 9).as("kalman_estimate"),
        col("n_obs").cast("int").as("n_obs"))
  }

  /** Real Structured Streaming run of the tumbling aggregation over the
    * events parquet, driven to completion against the memory sink.
    * Returns the collected result table.
    */
  def streamingTumbling(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    // file streaming sources want a directory; Tables.eventsStreaming points
    // basePath at the sf dir, globs the single events file, and applies the
    // same ts normalization as the batch loader
    val stream = graft.Tables.eventsStreaming(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
  }
}
