package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar (no-matrix) Kalman filter, the reference's `kalman.*` function
  * family (`/root/reference/pkg/cypher/kalman_functions.go`,
  * `pkg/filter/kalman.go`): the database stays stateless — state goes in
  * and out with every call.
  *
  * Two forms:
  *  - [[KalmanFilter.step]]: pure Scala (state, measurement) → state, for
  *    host code / tests — the `kalman.process` contract.
  *  - [[KalmanFilter.filterSeries]]: a Catalyst fold (`aggregate` HOF) over
  *    an ordered array of measurements — per-entity series are filtered in
  *    one codegen'd pass with NO udf/serialization, the distributed path.
  */
object KalmanFilter {

  /** (estimate x, error covariance p). q = process noise, r = measurement noise. */
  case class State(x: Double, p: Double)

  def init(x0: Double, p0: Double = 1.0): State = State(x0, p0)

  /** One predict+update step. */
  def step(s: State, z: Double, q: Double, r: Double): State = {
    val pPred = s.p + q
    val k = pPred / (pPred + r)
    State(s.x + k * (z - s.x), (1 - k) * pPred)
  }

  /** Filter an ordered series in pure Scala (oracle for the column form). */
  def filterSeriesScala(zs: Seq[Double], q: Double, r: Double): Double = {
    if (zs.isEmpty) Double.NaN
    else zs.tail.foldLeft(init(zs.head))((s, z) => step(s, z, q, r)).x
  }

  /** Final filtered estimate over an ordered ARRAY<DOUBLE> column.
    * state = struct(x, p, first) folded left-to-right with the same
    * predict/update arithmetic as [[step]].
    */
  def filterSeriesCol(measurements: Column, q: Double, r: Double): Column = {
    val zero = struct(lit(0.0).as("x"), lit(1.0).as("p"), lit(false).as("init"))
    val folded = aggregate(
      measurements, zero,
      (s, z) => {
        val pPred = s.getField("p") + lit(q)
        val k = pPred / (pPred + lit(r))
        val xNew = s.getField("x") + k * (z - s.getField("x"))
        val pNew = (lit(1.0) - k) * pPred
        when(!s.getField("init"),
          struct(z.as("x"), lit(1.0).as("p"), lit(true).as("init")))
          .otherwise(struct(xNew.as("x"), pNew.as("p"), lit(true).as("init")))
      })
    when(folded.getField("init"), folded.getField("x")).otherwise(lit(null))
  }

  /** Velocity-tracking variant (`kalman.velocity.*`): fold keeping
    * (x, v, p) with constant-velocity prediction x' = x + v·dt.
    */
  def filterVelocityCol(tsValues: Column, q: Double, r: Double): Column = {
    // tsValues: ARRAY<STRUCT<t: DOUBLE, z: DOUBLE>> ordered by t
    val zero = struct(lit(0.0).as("x"), lit(0.0).as("v"), lit(1.0).as("p"),
      lit(Double.NaN).as("t"), lit(false).as("init"))
    val folded = aggregate(
      tsValues, zero,
      (s, e) => {
        val dt = e.getField("t") - s.getField("t")
        val xPred = s.getField("x") + s.getField("v") * dt
        val pPred = s.getField("p") + lit(q)
        val k = pPred / (pPred + lit(r))
        val xNew = xPred + k * (e.getField("z") - xPred)
        val vNew = when(dt > 0,
          s.getField("v") + k * (e.getField("z") - xPred) / dt)
          .otherwise(s.getField("v"))
        when(!s.getField("init"),
          struct(e.getField("z").as("x"), lit(0.0).as("v"), lit(1.0).as("p"),
            e.getField("t").as("t"), lit(true).as("init")))
          .otherwise(struct(xNew.as("x"), vNew.as("v"),
            ((lit(1.0) - k) * pPred).as("p"), e.getField("t").as("t"), lit(true).as("init")))
      })
    struct(folded.getField("x").as("x"), folded.getField("v").as("v"))
  }
}
