package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial points and calendar durations (SURVEY §1.2, §2.10):
  * `point()` / `point.distance` / `withinBBox`
  * (`/root/reference/pkg/cypher/functions_eval_math.go:720-1163`) and the
  * `duration` struct (`pkg/cypher/duration.go`). Points are plain structs
  * (x, y, srid); durations are (months, days, seconds) — both columnar,
  * no UDT needed.
  */
object SpatialTemporal {

  // ---- points ---------------------------------------------------------
  val SridCartesian = 7203
  val SridWgs84 = 4326

  def point(x: Column, y: Column, srid: Int = SridCartesian): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"), lit(srid).as("srid"))

  /** Euclidean distance (cartesian SRID) — exact IEEE arithmetic. */
  def distance(p1: Column, p2: Column): Column = {
    val dx = p1.getField("x") - p2.getField("x")
    val dy = p1.getField("y") - p2.getField("y")
    sqrt(dx * dx + dy * dy)
  }

  /** Haversine distance in km for WGS84 points (x=lon, y=lat), rounded to
    * 6 decimals for cross-engine stability of the trig.
    */
  def haversineKm(p1: Column, p2: Column): Column = {
    val r = 6371.0
    val lat1 = radians(p1.getField("y"))
    val lat2 = radians(p2.getField("y"))
    val dLat = radians(p2.getField("y") - p1.getField("y"))
    val dLon = radians(p2.getField("x") - p1.getField("x"))
    val a = pow(sin(dLat / 2), 2) + cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
    round(lit(2 * r) * asin(sqrt(a)), 6)
  }

  def withinBBox(p: Column, minX: Column, minY: Column, maxX: Column, maxY: Column): Column =
    p.getField("x") >= minX && p.getField("x") <= maxX &&
      p.getField("y") >= minY && p.getField("y") <= maxY

  // ---- durations ------------------------------------------------------

  /** Month-boundary crossings between two timestamps (DuckDB
    * date_diff('month') semantics).
    */
  def durationMonths(a: Column, b: Column): Column =
    (year(b) * 12 + month(b)) - (year(a) * 12 + month(a))

  def durationDays(a: Column, b: Column): Column = datediff(b.cast("date"), a.cast("date"))

  def durationSeconds(a: Column, b: Column): Column =
    unix_timestamp(b) - unix_timestamp(a)

  /** duration.between → struct(months, days, seconds) of total elapsed in
    * each unit (the reference's inMonths/inDays/inSeconds accessors).
    */
  def durationBetween(a: Column, b: Column): Column =
    struct(durationMonths(a, b).as("months"), durationDays(a, b).as("days"),
      durationSeconds(a, b).as("seconds"))
}
