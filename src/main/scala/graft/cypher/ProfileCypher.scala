package graft.cypher

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import graft.graph.PropertyGraph

/** PROFILE surface (SURVEY §2.9: the reference's PROFILE returns the
  * operator tree with estimated + actual rows and per-operator time,
  * `explain.go:171-460`): run the query, then walk the final physical plan
  * and report per operator
  *
  *   - `rows`      — ACTUAL output rows (numOutputRows SQLMetric; -1 where
  *                   Spark tracks none for the node)
  *   - `est_rows`  — the optimizer's estimate: CBO rowCount when present,
  *                   else the sizeInBytes estimate divided by the schema
  *                   row width (Spark's own default-size model)
  *   - `time_ms`   — the operator's timing SQLMetrics summed (scan time,
  *                   aggregate build time, sort time, shuffle write time,
  *                   broadcast build time…); operators fused into a
  *                   WholeStageCodegen stage with no metric of their own
  *                   report the stage's pipeline duration (execution time
  *                   is genuinely per-pipeline, not per-op, once fused)
  *
  * [[ExplainCypher]] names the logical steps Neo4j-style; this is the
  * runtime-truth companion. The reference's dbHits counts storage touches —
  * a native-engine notion with no Spark analog; rows/time are reported
  * instead.
  */
object ProfileCypher {

  def profile(g: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val df = Cypher.run(g, query, params)
    // execute THIS queryExecution (count() would plan a different query
    // and leave these operators' metrics untouched)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }

    def ownTimeMs(op: SparkPlan): Double = {
      val ts = op.metrics.values.collect {
        case m if m.metricType == "timing" => m.value.toDouble
        case m if m.metricType == "nsTiming" => m.value / 1e6
      }
      if (ts.isEmpty) -1.0 else ts.sum
    }
    def actualRows(op: SparkPlan): Long =
      op.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    def estRows(op: SparkPlan): Long =
      op.logicalLink.map { lp =>
        val st = lp.stats
        st.rowCount.map(_.toLong).getOrElse {
          // Spark's size-only estimate: default row width = 8B overhead +
          // per-field default sizes (mirrors EstimationUtils.getSizePerRow)
          val width = 8L + lp.output.map(_.dataType.defaultSize.toLong).sum
          st.sizeInBytes.toLong / math.max(1L, width)
        }
      }.getOrElse(-1L)

    val out = ArrayBuffer.empty[(String, Long, Long, Double)]
    def walk(op: SparkPlan, pipelineMs: Double): Unit = op match {
      case w: WholeStageCodegenExec =>
        val d = ownTimeMs(w)
        out += ((s"${w.nodeName} (${w.codegenStageId})", actualRows(w), estRows(w), d))
        w.children.foreach(walk(_, d))
      case ia: InputAdapter =>
        // codegen-stage input boundary: the input operator's rows are
        // pulled through this stage's pipeline, so its duration still
        // applies (matches how the SQL UI attributes stage duration)
        ia.children.foreach(walk(_, pipelineMs))
      case qs: QueryStageExec => // AQE stage: descend into the materialized plan
        walk(qs.plan, pipelineMs)
      case re: ReusedExchangeExec =>
        out += ((re.nodeName, actualRows(re), estRows(re), pipelineMs))
      case _ =>
        val own = ownTimeMs(op)
        out += ((op.nodeName, actualRows(op),
          estRows(op), if (own >= 0) own else pipelineMs))
        op.children.foreach(walk(_, pipelineMs))
    }
    walk(plan, -1.0)

    val spark = g.nodes.sparkSession
    import spark.implicits._
    out.toSeq.toDF("operator", "rows", "est_rows", "time_ms")
  }
}
