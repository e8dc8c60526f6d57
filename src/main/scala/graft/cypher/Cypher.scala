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

  private val usePrefix = """(?is)^\s*(?::\s*)?USE\s+([A-Za-z_][A-Za-z0-9_.]*)\s+(.*)$""".r

  /** Multi-database routing (SURVEY §2.9 system commands — the reference
    * namespaces storage per database, `pkg/storage/namespaced.go`,
    * `pkg/multidb/`): `USE <name> MATCH …` selects the graph from the
    * catalog; without a USE prefix the default graph runs the query.
    */
  def runMulti(catalog: Map[String, PropertyGraph], default: PropertyGraph,
      query: String, params: Map[String, Any] = Map.empty): DataFrame =
    query match {
      case usePrefix(db, rest) =>
        val g = catalog.getOrElse(db,
          throw new IllegalArgumentException(
            s"unknown database $db (have: ${catalog.keys.toSeq.sorted.mkString(", ")})"))
        run(g, rest, params)
      case _ => run(default, query, params)
    }
}
