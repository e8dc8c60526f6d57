package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.{Expand, PropertyGraph}

/** APOC path-expansion procedures (SURVEY §2.11:
  * `apoc.path.subgraphNodes / expand / spanningTree`,
  * `apoc.neighbors.tohop / byhop` —
  * `/root/reference/pkg/cypher/call_apoc_path.go:42,380,697`,
  * `apoc_algorithms.go:448,495`): BFS frontier loops with level caps and
  * rel-type/label filters, built on the same cached-frontier expansion as
  * var-length MATCH.
  */
object PathExpand {

  /** All nodes reachable within maxLevel hops (any depth ≤ maxLevel),
    * optional rel-type and end-label filter. Returns (start_id, node_id,
    * at minimum depth reached).
    */
  def subgraphNodes(g: PropertyGraph, startIds: DataFrame, maxLevel: Int,
      relType: Option[String] = None, labelFilter: Option[String] = None,
      direction: Expand.Direction = Expand.Out): DataFrame = {
    val reach = Expand.shortestPaths(g, startIds, relType, maxLevel, direction)
      .filter(col("length") > 0)
      .select(col("start_id"), col("end_id").as("node_id"), col("length").as("depth"))
    labelFilter match {
      case Some(l) =>
        reach.join(g.nodesByLabel(l).select(col("id").as("node_id")), "node_id")
      case None => reach
    }
  }

  /** apoc.neighbors.byhop: count of distinct nodes first reached at each
    * hop ≤ maxLevel.
    */
  def neighborsByHop(g: PropertyGraph, startIds: DataFrame, maxLevel: Int,
      relType: Option[String] = None,
      direction: Expand.Direction = Expand.Out): DataFrame =
    Expand.shortestPaths(g, startIds, relType, maxLevel, direction)
      .filter(col("length") > 0)
      .groupBy(col("start_id"), col("length").as("hop"))
      .agg(count(lit(1)).as("n_nodes"))

  /** apoc.path.spanningTree: BFS tree edges — each reached node paired with
    * ONE parent on a shortest path (deterministic: min parent id).
    */
  def spanningTree(g: PropertyGraph, startId: String, maxLevel: Int,
      relType: Option[String] = None): DataFrame = {
    val start = g.nodes.filter(col("id") === startId).select("id")
    // the BFS frontier of ONE start node is result-sized (it IS the tree
    // the caller gets back) but comes from an RDD with no Catalyst stats —
    // without the explicit broadcast both parent joins sort-merge the FULL
    // edge table, which went 2.5x super-linear at the 10x scale check
    val dist = broadcast(
      Expand.shortestPaths(g, start, relType, maxLevel, Expand.Out)
        .select(col("end_id").as("node_id"), col("length")))
    val es = relType.map(g.edgesByType).getOrElse(g.edges).select("src", "dst")
    // parent candidates: edges whose src sits exactly one level above dst
    dist.toDF("parent", "plen")
      .join(es, col("parent") === col("src"))
      .join(dist, col("dst") === col("node_id"))
      .filter(col("length") === col("plen") + 1)
      .groupBy(col("node_id"), col("length"))
      .agg(min(col("parent")).as("parent"))
      .select("node_id", "parent", "length")
  }
}
