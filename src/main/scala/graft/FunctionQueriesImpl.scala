package graft

import org.apache.spark.sql.functions._
import graft.functions.{Decay, KalmanFilter, SpatialTemporal}

/** Scalar-function surface (SURVEY §2.10, §2.12): temporal accessors,
  * duration struct, spatial points, decay scoring, Kalman filtering.
  */
object FunctionQueriesImpl {

  val queries: Map[String, GQuery] = Map(
    "q_fn_temporal_accessors" -> GQuery(
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"), // 0=Sunday, DuckDB-style
          date_trunc("month", col("o_orderdate")).as("month_start")),
      Some("""SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS dom,
                CAST(quarter(o_orderdate) AS INT) AS q,
                CAST(dayofweek(o_orderdate) AS INT) AS dow,
                date_trunc('month', o_orderdate) AS month_start
              FROM orders WHERE o_orderkey <= 2000"""), "2.10"),

    "q_fn_duration" -> GQuery(
      (s, d) => {
        val maxDate = lit("2001-08-01 00:00:00").cast("timestamp")
        Tables.orders(s, d).filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"),
            SpatialTemporal.durationMonths(col("o_orderdate"), maxDate).as("months"),
            SpatialTemporal.durationDays(col("o_orderdate"), maxDate).as("days"),
            SpatialTemporal.durationSeconds(col("o_orderdate"), maxDate).as("seconds"))
      },
      Some("""SELECT o_orderkey,
                CAST(date_diff('month', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') AS INT) AS months,
                CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') AS INT) AS days,
                date_diff('second', o_orderdate, TIMESTAMP '2001-08-01 00:00:00') AS seconds
              FROM orders WHERE o_orderkey <= 2000"""), "2.10"),

    "q_fn_point_distance" -> GQuery(
      (s, d) => {
        // deterministic synthetic coordinates from customer keys
        val c = Tables.customer(s, d).filter(col("c_custkey") <= 500)
          .withColumn("p", SpatialTemporal.point(
            col("c_custkey") % 360 - 180, col("c_custkey") % 171 - 85, SpatialTemporal.SridWgs84))
        val origin = SpatialTemporal.point(lit(0.0), lit(0.0), SpatialTemporal.SridWgs84)
        c.select(col("c_custkey"),
          round(SpatialTemporal.distance(col("p"), origin), 9).as("euclid"),
          SpatialTemporal.haversineKm(col("p"), origin).as("haversine_km"),
          SpatialTemporal.withinBBox(col("p"), lit(-90), lit(-45), lit(90), lit(45)).as("in_bbox"))
      },
      Some("""SELECT c_custkey,
                round(sqrt((CAST(c_custkey % 360 - 180 AS DOUBLE)) * (c_custkey % 360 - 180)
                         + (CAST(c_custkey % 171 - 85 AS DOUBLE)) * (c_custkey % 171 - 85)), 9) AS euclid,
                round(2 * 6371.0 * asin(sqrt(
                    pow(sin(radians(CAST(c_custkey % 171 - 85 AS DOUBLE)) / 2), 2)
                  + cos(radians(0.0)) * cos(radians(CAST(c_custkey % 171 - 85 AS DOUBLE)))
                    * pow(sin(radians(CAST(c_custkey % 360 - 180 AS DOUBLE)) / 2), 2))), 6) AS haversine_km,
                (c_custkey % 360 - 180) >= -90 AND (c_custkey % 360 - 180) <= 90
                  AND (c_custkey % 171 - 85) >= -45 AND (c_custkey % 171 - 85) <= 45 AS in_bbox
              FROM customer WHERE c_custkey <= 500"""), "2.10"),

    "q_fn_decay_score" -> GQuery(
      (s, d) => {
        val now = lit("2024-02-01 00:00:00").cast("timestamp")
        Tables.events(s, d).filter(col("event_id") < 2000)
          .withColumn("age_days", datediff(now.cast("date"), col("ts").cast("date")))
          .select(col("event_id"),
            Decay.decayScore(col("age_days"), lit(7.0)).as("decay_short"),
            Decay.decayScore(col("age_days"), lit(693.0)).as("decay_long"),
            Decay.accessBoost(col("user_id")).as("boost"))
      },
      Some("""SELECT event_id,
                round(pow(2.0, -CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS DOUBLE) / 7.0), 9) AS decay_short,
                round(pow(2.0, -CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS DOUBLE) / 693.0), 9) AS decay_long,
                round(1.0 + ln(1.0 + CAST(user_id AS DOUBLE)) / 10.0, 9) AS boost
              FROM events WHERE event_id < 2000"""), "2.12"),

    // the sequential predict/update fold is replayed in DuckDB with a
    // struct-accumulator list_reduce — same IEEE operation order, so the
    // estimate hash-matches bit-for-bit after a 9-dp round (also
    // exact-match tested against the pure-Scala reference in FunctionSpec)
    "q_fn_kalman" -> GQuery(
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("event_id"), col("value")))).as("series"))
        .select(col("user_id"),
          round(KalmanFilter.filterSeriesCol(
            transform(col("series"), e => e.getField("value")), 0.01, 1.0), 9)
            .as("kalman_estimate"),
          size(col("series")).as("n_obs")),
      Some(FunctionQueriesImpl.kalmanOracleSql), "2.10"))

  /** Shared by the batch fold (q_fn_kalman) and the mapGroupsWithState
    * streaming variant (q_stream_kalman_state) — identical results.
    * (a def: the queries map above initializes first)
    */
  def kalmanOracleSql: String =
    """WITH s AS (
         SELECT user_id,
                list(CAST(value AS DOUBLE) ORDER BY event_id, value) AS zs
         FROM events GROUP BY user_id)
       SELECT user_id,
         round((list_reduce(
           list_transform(zs, z -> {x: z, p: CAST(1.0 AS DOUBLE), z: z}),
           (acc, e) -> {
             x: acc.x + ((acc.p + CAST(0.01 AS DOUBLE)) /
                         ((acc.p + CAST(0.01 AS DOUBLE)) + CAST(1.0 AS DOUBLE)))
                        * (e.z - acc.x),
             p: (CAST(1.0 AS DOUBLE) -
                 (acc.p + CAST(0.01 AS DOUBLE)) /
                 ((acc.p + CAST(0.01 AS DOUBLE)) + CAST(1.0 AS DOUBLE)))
                * (acc.p + CAST(0.01 AS DOUBLE)),
             z: e.z})).x, 9) AS kalman_estimate,
         CAST(len(zs) AS INT) AS n_obs
       FROM s"""
}
