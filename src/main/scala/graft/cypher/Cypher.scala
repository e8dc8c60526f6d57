package graft.cypher

import org.apache.spark.sql.DataFrame
import graft.graph.PropertyGraph

/** Public facade: `Cypher.run(graph, "MATCH (c:Customer) RETURN ...")`.
  *
  * query string → [[Lexer]] → [[Parser]] (typed AST) → [[Planner]]
  * (DataFrame transformations) → Catalyst. Parameters are bound as literals
  * at plan time (never string-spliced — the injection class the reference's
  * chaos tests target, `/root/reference/pkg/cypher/chaos_injection_test.go`,
  * cannot arise).
  */
object Cypher {
  def run(g: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): DataFrame =
    Planner.plan(g, Parser.parse(query), params)
}
