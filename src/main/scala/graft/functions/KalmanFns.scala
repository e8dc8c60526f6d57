package graft.functions

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Cypher-callable Kalman function family — behavioral spec
  * `/root/reference/pkg/cypher/kalman_functions.go` (SHOW FUNCTIONS
  * rows at `executor_show.go:152-161`): stateless engine, user-held
  * state. The filter state travels as a JSON string (stored in a node
  * property, threaded through WITH); every function parses it, steps
  * the exact reference recurrence, and returns the updated state.
  *
  *   - `kalman.{init,process,predict,state,rate,reset}` — scalar filter
  *     (kalman_functions.go:205-485)
  *   - `kalman.velocity.{init,process,predict}` — 2-state
  *     position+velocity filter (kalman_functions.go:487-705)
  *   - `kalman.adaptive.{init,process}` — auto-switching basic/velocity
  *     with hysteresis (kalman_functions.go:707-905)
  *
  * State JSON uses the reference's field names (`x/lx/p/k/e/q/r/vs/n`,
  * `pos/vel/p/qp/qv/r/dt/n`, adaptive wrapper) so states round-trip
  * across engines; numeric formatting follows Jackson (30.0 vs Go's
  * 30) which both parsers accept.
  *
  * Where the reference returns a MAP, this engine returns a typed
  * STRUCT (`result.value`, `result.state`, …) — the Spark-native form
  * of the same shape, and what dot-access compiles against.
  */
object KalmanFns {

  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        java.lang.Boolean]()))

  /** Register the family as session temp functions (the HashExprs
    * pattern): `kalman.velocity.process` → `graft_kalman_velocity_process`.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (registered.contains(spark)) return
    val reg = spark.sessionState.functionRegistry
    Seq("kalman.init", "kalman.process", "kalman.predict", "kalman.state",
      "kalman.rate", "kalman.reset", "kalman.velocity.init",
      "kalman.velocity.process", "kalman.velocity.predict",
      "kalman.adaptive.init", "kalman.adaptive.process").foreach { fn =>
      reg.createOrReplaceTempFunction("graft_" + fn.replace(".", "_"),
        args => KalmanFnExpr(fn, args), "built-in")
    }
    registered.add(spark)
  }

  final case class Basic(var x: Double, var lx: Double, var p: Double,
      var k: Double, var e: Double, var q: Double, var r: Double,
      var vs: Double, var n: Long)
  final case class Velocity(var pos: Double, var vel: Double,
      var p: Array[Double], var qp: Double, var qv: Double, var r: Double,
      var dt: Double, var n: Long)
  final case class Adaptive(var basic: Basic, var velocity: Velocity,
      var mode: String, var ss: Long, var tt: Double, var st: Double,
      var hy: Long, var n: Long, var lf: Double, var ts: Double)

  // defaults: kalman_functions.go:206-246
  def defaultBasic(): Basic =
    Basic(0, 0, 30.0, 0, 1.0, 0.0001, 88.0, 10.0, 0)
  def defaultVelocity(): Velocity =
    Velocity(0, 0, Array(100.0, 0, 0, 10.0), 0.1, 0.01, 1.0, 1.0, 0)
  def defaultAdaptive(): Adaptive =
    Adaptive(defaultBasic(), defaultVelocity(), "basic", 0, 0.1, 0.02, 10, 0, 0, 0)

  // ========================================================= JSON =======

  private def num(sb: StringBuilder, d: Double): Unit =
    if (d == d.toLong && math.abs(d) < 1e15) sb.append(d.toLong) // Go shortest form
    else {
      val s = d.toString
      if (s.indexOf('E') >= 0) // Go never uses scientific form here
        sb.append(new java.math.BigDecimal(s).stripTrailingZeros.toPlainString)
      else sb.append(s)
    }

  def renderBasic(s: Basic): String = {
    val sb = new StringBuilder("{\"x\":"); num(sb, s.x)
    sb.append(",\"lx\":"); num(sb, s.lx)
    sb.append(",\"p\":"); num(sb, s.p)
    sb.append(",\"k\":"); num(sb, s.k)
    sb.append(",\"e\":"); num(sb, s.e)
    sb.append(",\"q\":"); num(sb, s.q)
    sb.append(",\"r\":"); num(sb, s.r)
    sb.append(",\"vs\":"); num(sb, s.vs)
    sb.append(",\"n\":").append(s.n).append("}")
    sb.toString
  }

  def renderVelocity(s: Velocity): String = {
    val sb = new StringBuilder("{\"pos\":"); num(sb, s.pos)
    sb.append(",\"vel\":"); num(sb, s.vel)
    sb.append(",\"p\":[")
    s.p.zipWithIndex.foreach { case (d, i) =>
      if (i > 0) sb.append(","); num(sb, d) }
    sb.append("],\"qp\":"); num(sb, s.qp)
    sb.append(",\"qv\":"); num(sb, s.qv)
    sb.append(",\"r\":"); num(sb, s.r)
    sb.append(",\"dt\":"); num(sb, s.dt)
    sb.append(",\"n\":").append(s.n).append("}")
    sb.toString
  }

  def renderAdaptive(s: Adaptive): String = {
    val sb = new StringBuilder("{\"basic\":").append(renderBasic(s.basic))
    sb.append(",\"velocity\":").append(renderVelocity(s.velocity))
    sb.append(",\"mode\":\"").append(s.mode).append("\"")
    sb.append(",\"ss\":").append(s.ss)
    sb.append(",\"tt\":"); num(sb, s.tt)
    sb.append(",\"st\":"); num(sb, s.st)
    sb.append(",\"hy\":").append(s.hy)
    sb.append(",\"n\":").append(s.n)
    sb.append(",\"lf\":"); num(sb, s.lf)
    sb.append(",\"ts\":"); num(sb, s.ts)
    sb.append("}")
    sb.toString
  }

  private def d(n: JsonNode, k: String): Double =
    Option(n.get(k)).map(_.asDouble()).getOrElse(0.0)
  private def l(n: JsonNode, k: String): Long =
    Option(n.get(k)).map(_.asLong()).getOrElse(0L)

  def parseBasic(n: JsonNode): Basic =
    Basic(d(n, "x"), d(n, "lx"), d(n, "p"), d(n, "k"), d(n, "e"),
      d(n, "q"), d(n, "r"), d(n, "vs"), l(n, "n"))

  def parseVelocity(n: JsonNode): Velocity = {
    val arr = Option(n.get("p")).filter(_.isArray)
      .map(a => Array.tabulate(4)(i => if (i < a.size()) a.get(i).asDouble() else 0.0))
      .getOrElse(Array(100.0, 0, 0, 10.0))
    Velocity(d(n, "pos"), d(n, "vel"), arr, d(n, "qp"), d(n, "qv"),
      d(n, "r"), d(n, "dt"), l(n, "n"))
  }

  def parseAdaptive(n: JsonNode): Adaptive =
    Adaptive(
      Option(n.get("basic")).map(parseBasic).getOrElse(defaultBasic()),
      Option(n.get("velocity")).map(parseVelocity).getOrElse(defaultVelocity()),
      Option(n.get("mode")).map(_.asText()).getOrElse("basic"),
      l(n, "ss"), d(n, "tt"), d(n, "st"), l(n, "hy"), l(n, "n"),
      d(n, "lf"), d(n, "ts"))

  private def parsed(stateJson: String): Option[JsonNode] =
    JsonImpls.parse(stateJson).filter(_.isObject)

  // ===================================================== functions ======

  private def cfgD(config: Map[String, Any], k: String): Option[Double] =
    config.get(k).flatMap {
      case dd: Double => Some(dd)
      case ll: Long => Some(ll.toDouble)
      case i: Int => Some(i.toDouble)
      case s: String => s.toDoubleOption
      case _ => None
    }

  /** kalman.init(config?) (kalman_functions.go:290-310). */
  def init(config: Map[String, Any]): String = {
    val s = defaultBasic()
    cfgD(config, "processNoise").foreach(pn => s.q = pn * 0.001)
    cfgD(config, "measurementNoise").foreach(s.r = _)
    cfgD(config, "initialCovariance").foreach(s.p = _)
    cfgD(config, "varianceScale").foreach(s.vs = _)
    renderBasic(s)
  }

  /** kalman.process(m, state, target?) → (value, state)
    * (kalman_functions.go:360-408); invalid state echoes the measurement.
    */
  def process(m: Double, stateJson: String, target: Double): (Double, String) =
    parsed(stateJson).filter(_.has("x")) match {
      case None => (m, stateJson)
      case Some(node) =>
        val s = parseBasic(node)
        val velocity = s.x - s.lx
        s.x += velocity
        s.lx = s.x
        s.e = if (target != 0.0 && s.lx != 0.0) math.abs(1.0 - target / s.lx)
          else 1.0
        s.p = s.p + s.q * s.e
        s.k = s.p / (s.p + s.r)
        s.x += s.k * (m - s.x)
        s.p = (1.0 - s.k) * s.p
        s.n += 1
        (s.x, renderBasic(s))
    }

  /** kalman.predict(state, steps) (kalman_functions.go:440-448). */
  def predict(stateJson: String, steps: Long): Double =
    parsed(stateJson).map(parseBasic)
      .map(s => s.x + steps * (s.x - s.lx)).getOrElse(0.0)

  /** kalman.state(state) (kalman_functions.go:462-469). */
  def stateValue(stateJson: String): Double =
    parsed(stateJson).map(parseBasic).map(_.x).getOrElse(0.0)

  /** kalman.rate(state) (kalman_functions.go:478-485). */
  def rate(stateJson: String): Double =
    parsed(stateJson).map(parseBasic).map(s => s.x - s.lx).getOrElse(0.0)

  /** kalman.reset(state): type-sniffing re-init
    * (kalman_functions.go:928-952).
    */
  def reset(stateJson: String): String = parsed(stateJson) match {
    case None => init(Map.empty)
    case Some(n) if n.has("pos") => velocityInit(None)
    case Some(n) if n.has("mode") => adaptiveInit(Map.empty)
    case Some(_) => init(Map.empty)
  }

  /** kalman.velocity.init(pos?, vel?) (kalman_functions.go:630-639). */
  def velocityInit(initial: Option[(Double, Double)]): String = {
    val s = defaultVelocity()
    initial.foreach { case (p0, v0) => s.pos = p0; s.vel = v0 }
    renderVelocity(s)
  }

  /** kalman.velocity.process(m, state) → (value, velocity, state)
    * (kalman_functions.go:595-660): exact 2-state predict/update.
    */
  def velocityProcess(m: Double, stateJson: String): (Double, Double, String) =
    parsed(stateJson).filter(_.has("pos")) match {
      case None => (m, 0.0, stateJson)
      case Some(node) =>
        val s = parseVelocity(node)
        val dt = if (s.dt <= 0) 1.0 else s.dt
        val predPos = s.pos + s.vel * dt
        val predVel = s.vel
        val Array(p00, p01, p10, p11) = s.p
        val pp00 = p00 + dt * p10 + dt * p01 + dt * dt * p11 + s.qp
        val pp01 = p01 + dt * p11
        val pp10 = p10 + dt * p11
        val pp11 = p11 + s.qv
        val innovation = m - predPos
        val sInn = pp00 + s.r
        val k0 = pp00 / sInn
        val k1 = pp10 / sInn
        s.pos = predPos + k0 * innovation
        s.vel = predVel + k1 * innovation
        s.p = Array((1 - k0) * pp00, (1 - k0) * pp01,
          pp10 - k1 * pp00, pp11 - k1 * pp01)
        s.n += 1
        (s.pos, s.vel, renderVelocity(s))
    }

  /** kalman.velocity.predict(state, steps) (kalman_functions.go:695-705). */
  def velocityPredict(stateJson: String, steps: Long): Double =
    parsed(stateJson).map(parseVelocity).map { s =>
      val dt = if (s.dt <= 0) 1.0 else s.dt
      s.pos + s.vel * steps * dt
    }.getOrElse(0.0)

  /** kalman.adaptive.init(config?) (kalman_functions.go:760-785). */
  def adaptiveInit(config: Map[String, Any]): String = {
    val s = defaultAdaptive()
    cfgD(config, "trendThreshold").foreach(s.tt = _)
    cfgD(config, "stabilityThreshold").foreach(s.st = _)
    cfgD(config, "hysteresis").foreach(h => s.hy = h.toLong)
    config.get("initialMode").collect { case "velocity" => s.mode = "velocity" }
    renderAdaptive(s)
  }

  /** kalman.adaptive.process(m, state) → (value, mode, state)
    * (kalman_functions.go:845-905): current-mode step + hysteresis-gated
    * mode switch with state sync.
    */
  def adaptiveProcess(m: Double, stateJson: String): (Double, String, String) =
    parsed(stateJson).filter(_.has("mode")) match {
      case None => (m, "error", stateJson)
      case Some(node) =>
        val s = parseAdaptive(node)
        val filtered =
          if (s.mode == "velocity") {
            val (v, _, st) = velocityProcess(m, renderVelocity(s.velocity))
            s.velocity = parseVelocity(JsonImpls.parse(st).get)
            s.ts = s.velocity.vel
            v
          } else {
            val (v, st) = process(m, renderBasic(s.basic), 0.0)
            s.basic = parseBasic(JsonImpls.parse(st).get)
            s.ts = s.basic.x - s.basic.lx
            v
          }
        s.n += 1
        s.ss += 1
        if (s.ss >= s.hy) {
          val trend = math.abs(s.ts)
          if (s.mode == "basic" && trend > s.tt) {
            s.mode = "velocity"; s.ss = 0
            s.velocity.pos = s.basic.x
            s.velocity.vel = s.ts
          } else if (s.mode == "velocity" && trend < s.st) {
            s.mode = "basic"; s.ss = 0
            s.basic.x = s.velocity.pos
            s.basic.lx = s.velocity.pos - s.velocity.vel
          }
        }
        s.lf = filtered
        (filtered, s.mode, renderAdaptive(s))
    }
}

/** One Catalyst expression for the whole `kalman.*` family: arity and
  * result type keyed by the function name. State threads as a string
  * through WITH / reduce(); process results are typed structs.
  */
case class KalmanFnExpr(fn: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true

  override def dataType: DataType = fn match {
    case "kalman.init" | "kalman.reset" | "kalman.velocity.init" |
        "kalman.adaptive.init" => StringType
    case "kalman.predict" | "kalman.state" | "kalman.rate" |
        "kalman.velocity.predict" => DoubleType
    case "kalman.process" => StructType(Seq(
      StructField("value", DoubleType), StructField("state", StringType)))
    case "kalman.velocity.process" => StructType(Seq(
      StructField("value", DoubleType), StructField("velocity", DoubleType),
      StructField("state", StringType)))
    case "kalman.adaptive.process" => StructType(Seq(
      StructField("value", DoubleType), StructField("mode", StringType),
      StructField("state", StringType)))
    case other => throw new IllegalArgumentException(s"unknown function $other")
  }

  private def str(v: Any): String = v match {
    case null => ""
    case u: UTF8String => u.toString
    case o => o.toString
  }

  private def dbl(v: Any): Double = v match {
    case null => 0.0
    case d: Double => d; case f: Float => f.toDouble
    case l: Long => l.toDouble; case i: Int => i.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case u: UTF8String => u.toString.toDouble
    case o => o.toString.toDouble
  }

  /** Config argument: a Cypher map literal compiles to a struct; a
    * parameter may arrive as a map. Both flatten to Map[String, Any].
    */
  private def cfg(i: Int, input: InternalRow): Map[String, Any] =
    if (children.size <= i) Map.empty
    else (children(i).eval(input), children(i).dataType) match {
      case (null, _) => Map.empty
      case (row: InternalRow, st: StructType) =>
        st.fields.zipWithIndex.map { case (f2, j) =>
          f2.name -> (row.get(j, f2.dataType) match {
            case u: UTF8String => u.toString
            case o => o
          })
        }.toMap
      case (m: MapData, mt: MapType) =>
        val b = Map.newBuilder[String, Any]
        m.foreach(mt.keyType, mt.valueType, (k, v) => b += (str(k) -> (v match {
          case u: UTF8String => u.toString
          case o => o
        })))
        b.result()
      case _ => Map.empty
    }

  override def eval(input: InternalRow): Any = {
    def arg(i: Int): Any = children(i).eval(input)
    fn match {
      case "kalman.init" => UTF8String.fromString(KalmanFns.init(cfg(0, input)))
      case "kalman.reset" =>
        UTF8String.fromString(KalmanFns.reset(str(arg(0))))
      case "kalman.state" => KalmanFns.stateValue(str(arg(0)))
      case "kalman.rate" => KalmanFns.rate(str(arg(0)))
      case "kalman.predict" =>
        KalmanFns.predict(str(arg(0)), dbl(arg(1)).toLong)
      case "kalman.process" =>
        val target = if (children.size >= 3) dbl(arg(2)) else 0.0
        val (v, st) = KalmanFns.process(dbl(arg(0)), str(arg(1)), target)
        InternalRow(v, UTF8String.fromString(st))
      case "kalman.velocity.init" =>
        // both args optional: (pos), or (pos, vel) — signature
        // initialPos? :: FLOAT, initialVel? :: FLOAT
        val initial =
          if (children.isEmpty) None
          else Some((dbl(arg(0)),
            if (children.size >= 2) dbl(arg(1)) else 0.0))
        UTF8String.fromString(KalmanFns.velocityInit(initial))
      case "kalman.velocity.process" =>
        val (v, vel, st) = KalmanFns.velocityProcess(dbl(arg(0)), str(arg(1)))
        InternalRow(v, vel, UTF8String.fromString(st))
      case "kalman.velocity.predict" =>
        KalmanFns.velocityPredict(str(arg(0)), dbl(arg(1)).toLong)
      case "kalman.adaptive.init" =>
        UTF8String.fromString(KalmanFns.adaptiveInit(cfg(0, input)))
      case "kalman.adaptive.process" =>
        val (v, mode, st) = KalmanFns.adaptiveProcess(dbl(arg(0)), str(arg(1)))
        InternalRow(v, UTF8String.fromString(mode), UTF8String.fromString(st))
      case other => throw new IllegalArgumentException(s"unknown function $other")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
