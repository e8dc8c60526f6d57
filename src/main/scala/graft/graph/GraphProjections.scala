package graft.graph

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named in-memory graph projections (SURVEY §2.11 `gds.graph.project /
  * list / drop`, `call.go:711-721`, `pkg/cypher/fastrp.go:1-27`): a
  * projection is a label/rel-type-filtered, CACHED (nodes, edges) pair
  * that algorithms run against repeatedly without re-filtering the base
  * graph. `*` selects everything.
  */
object GraphProjections {

  case class Projection(name: String, graph: PropertyGraph,
      nodeCount: Long, relationshipCount: Long)

  private val reg = TrieMap.empty[String, Projection]

  def project(name: String, base: PropertyGraph,
      nodeLabel: String, relType: String): Projection = {
    require(!reg.contains(name), s"graph projection $name already exists")
    val nodes =
      (if (nodeLabel == "*") base.nodes else base.nodesByLabel(nodeLabel)).cache()
    val edges =
      (if (relType == "*") base.edges else base.edgesByType(relType)).cache()
    val p = Projection(name, PropertyGraph(nodes, edges), nodes.count(), edges.count())
    reg.put(name, p)
    p
  }

  /** Register an arbitrary pre-built graph under a name (apoc.graph.from*
    * constructors, clones, subgraphs).
    */
  def register(name: String, graph: PropertyGraph): Projection = {
    reg.remove(name)
    val p = Projection(name, graph, graph.nodes.count(), graph.edges.count())
    reg.put(name, p)
    p
  }

  def get(name: String): Projection =
    reg.getOrElse(name, sys.error(s"no such graph projection $name"))

  def list: Seq[Projection] = reg.values.toSeq.sortBy(_.name)

  def drop(name: String): Boolean = reg.remove(name) match {
    case Some(p) =>
      p.graph.nodes.unpersist(); p.graph.edges.unpersist(); true
    case None => false
  }
}
