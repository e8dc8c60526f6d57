package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Cypher
import graft.functions.KalmanFns

/** The Cypher-callable Kalman family
  * (`/root/reference/pkg/cypher/kalman_functions.go`, SHOW FUNCTIONS
  * rows `executor_show.go:152-161`): JSON state held by the user,
  * threaded through WITH / reduce(); basic, velocity (2-state), and
  * adaptive (auto-switching) filters.
  */
class KalmanFnsSpec extends AnyFunSuite {
  import TestSpark._

  private def one(q: String): org.apache.spark.sql.Row =
    Cypher.run(GraphQueries.graph(spark, sf), q).collect()(0)

  // ===================================================== unit level ======

  test("basic filter: defaults, config, exact first-step recurrence") {
    val st0 = KalmanFns.init(Map.empty)
    assert(st0 == """{"x":0,"lx":0,"p":30,"k":0,"e":1,"q":0.0001,"r":88,"vs":10,"n":0}""")
    // config mirrors kalmanInit (processNoise scales by 0.001)
    val cfg = KalmanFns.init(Map("measurementNoise" -> 50.0, "processNoise" -> 2.0))
    assert(cfg.contains("\"r\":50") && cfg.contains("\"q\":0.002"), cfg)
    // one step from rest: x' = k*m with k = p+q / (p+q+r)
    val (v1, st1) = KalmanFns.process(10.0, st0, 0.0)
    val k = 30.0001 / (30.0001 + 88.0)
    assert(math.abs(v1 - k * 10.0) < 1e-12)
    assert(KalmanFns.stateValue(st1) == v1)
    // converges toward a constant signal
    var st = st0
    var v = 0.0
    (1 to 200).foreach { _ =>
      val r = KalmanFns.process(10.0, st, 0.0); v = r._1; st = r._2 }
    assert(math.abs(v - 10.0) < 0.1, v)
    // predict projects the velocity; rate is the velocity itself
    assert(math.abs(KalmanFns.predict(st, 5) -
      (KalmanFns.stateValue(st) + 5 * KalmanFns.rate(st))) < 1e-12)
    // invalid state echoes the measurement with the state unchanged
    assert(KalmanFns.process(7.5, "garbage", 0.0) == ((7.5, "garbage")))
  }

  test("velocity filter tracks trends; adaptive switches modes") {
    // ramp 1,2,3,…,30 → velocity ≈ 1, position near the last sample
    var st = KalmanFns.velocityInit(None)
    var last = (0.0, 0.0, "")
    (1 to 30).foreach(i => { last = KalmanFns.velocityProcess(i.toDouble, st); st = last._3 })
    assert(math.abs(last._2 - 1.0) < 0.05, s"velocity ${last._2}")
    assert(math.abs(last._1 - 30.0) < 0.5, s"position ${last._1}")
    // velocity.predict uses the explicit velocity
    assert(math.abs(KalmanFns.velocityPredict(st, 10) - (last._1 + 10 * last._2)) < 1e-9)
    // custom initial point
    val init = KalmanFns.velocityInit(Some((5.0, 0.25)))
    assert(init.contains("\"pos\":5") && init.contains("\"vel\":0.25"), init)
    // single-arg form honors the position (initialVel defaults to 0)
    val one1 = one("RETURN kalman.velocity.init(50.0) AS s")
    assert(one1.getAs[String]("s").contains("\"pos\":50"), one1)

    // adaptive: trending signal switches basic→velocity after hysteresis,
    // then a flat signal switches back (kalman_functions.go:878-898)
    var ast = KalmanFns.adaptiveInit(Map("hysteresis" -> 3.0))
    var mode = "basic"
    (1 to 40).foreach(i => {
      val r = KalmanFns.adaptiveProcess(i * 2.0, ast); mode = r._2; ast = r._3 })
    assert(mode == "velocity", mode)
    (1 to 200).foreach(_ => {
      val r = KalmanFns.adaptiveProcess(80.0, ast); mode = r._2; ast = r._3 })
    assert(mode == "basic", mode)

    // reset sniffs the filter type (kalman_functions.go:928-952)
    assert(KalmanFns.reset(st).contains("\"pos\":0"))
    assert(KalmanFns.reset(ast).contains("\"mode\":\"basic\""))
    assert(KalmanFns.reset("not json") == KalmanFns.init(Map.empty))
  }

  // =================================================== Cypher level ======

  test("Cypher surface: init/process/state threading through WITH") {
    val r = one(
      """WITH kalman.init({measurementNoise: 44.0}) AS s0
         WITH kalman.process(10.0, s0) AS r1
         WITH r1.value AS v1, kalman.process(20.0, r1.state) AS r2
         RETURN v1, r2.value AS v2, kalman.state(r2.state) AS cur,
                kalman.predict(r2.state, 3) AS p3""")
    val (v1s, st1) = KalmanFns.process(10.0,
      KalmanFns.init(Map("measurementNoise" -> 44.0)), 0.0)
    val (v2s, st2) = KalmanFns.process(20.0, st1, 0.0)
    assert(r.getAs[Double]("v1") == v1s && r.getAs[Double]("v2") == v2s)
    assert(r.getAs[Double]("cur") == v2s)
    assert(r.getAs[Double]("p3") == KalmanFns.predict(st2, 3))
  }

  test("Cypher surface: velocity and adaptive structs, reduce() fold") {
    val r = one(
      """WITH kalman.velocity.init(1.0, 0.5) AS s0
         WITH kalman.velocity.process(2.0, s0) AS r1
         RETURN r1.value AS v, r1.velocity AS vel,
                kalman.velocity.predict(r1.state, 4) AS p4""")
    val (v, vel, st) = KalmanFns.velocityProcess(2.0,
      KalmanFns.velocityInit(Some((1.0, 0.5))))
    assert(r.getAs[Double]("v") == v && r.getAs[Double]("vel") == vel)
    assert(r.getAs[Double]("p4") == KalmanFns.velocityPredict(st, 4))

    val a = one(
      """WITH kalman.adaptive.init() AS s0
         WITH kalman.adaptive.process(3.0, s0) AS r1
         RETURN r1.value AS v, r1.mode AS mode""")
    assert(a.getAs[String]("mode") == "basic")

    // fold a series through reduce(): state stays a string accumulator
    val f = one(
      """WITH [1.0, 2.0, 3.0, 4.0, 5.0] AS series
         WITH reduce(s = kalman.velocity.init(), m IN series |
                kalman.velocity.process(m, s).state) AS fs
         RETURN round(kalman.velocity.predict(fs, 0), 6) AS pos""")
    var st2 = KalmanFns.velocityInit(None)
    Seq(1.0, 2.0, 3.0, 4.0, 5.0).foreach(m =>
      st2 = KalmanFns.velocityProcess(m, st2)._3)
    assert(f.getAs[Double]("pos") ==
      math.rint(KalmanFns.velocityPredict(st2, 0) * 1e6) / 1e6)
  }
}
