package graft.cypher

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.graph.PropertyGraph

/** PROFILE surface (SURVEY §2.9: the reference's PROFILE returns the
  * operator tree with ACTUAL rows per operator, `explain.go:171-460`):
  * run the query, then walk the final physical plan and report each
  * operator with its observed output-row metric. [[ExplainCypher]] names
  * the logical steps Neo4j-style; this is the runtime-truth companion.
  */
object ProfileCypher {

  /** (operator, rows) per physical operator, execution order bottom-up.
    * rows = -1 where Spark tracks no numOutputRows metric for the node.
    */
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
    val rows = plan.collect { case op: SparkPlan =>
      (op.nodeName, op.metrics.get("numOutputRows").map(_.value).getOrElse(-1L))
    }
    val spark = g.nodes.sparkSession
    import spark.implicits._
    rows.toDF("operator", "rows")
  }
}
