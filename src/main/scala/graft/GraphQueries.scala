package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Expand, PropertyGraph}
import OracleSafe._

/** Graph-pattern operator surface (SURVEY.md §2.1 scans, §2.3 expand joins,
  * §2.11 traversal procedures) exercised through [[PropertyGraph]] +
  * [[Expand]] over the TPC-H graph projection (FIXTURES.md §4). Every query
  * has a hand-derived SQL equivalent over the raw star schema.
  */
object GraphQueries {

  private val graphCache = new java.util.concurrent.ConcurrentHashMap[String, PropertyGraph]()

  def graph(s: SparkSession, d: String): PropertyGraph =
    graphCache.computeIfAbsent(d, _ => PropertyGraph.fromTpch(s, d).cache())

  private def q(name: String, section: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): (String, GQuery) =
    name -> GQuery(fn, Option(oracle).filter(_.nonEmpty), section)

  val queries: Map[String, GQuery] = Map(
    q("q_graph_label_scan", "2.1",
      """SELECT label, n FROM (
           SELECT 'Customer' AS label, COUNT(*) AS n FROM customer
           UNION ALL SELECT 'Order', COUNT(*) FROM orders
           UNION ALL SELECT 'Part', COUNT(*) FROM part
           UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
           UNION ALL SELECT 'Nation', COUNT(*) FROM nation
           UNION ALL SELECT 'Region', COUNT(*) FROM region)""") { (s, d) =>
      // MATCH (n) RETURN labels(n), count(*) — NodeByLabelScan × 6
      graph(s, d).nodes
        .select(explode(col("labels")).as("label"))
        .groupBy("label").agg(count(lit(1)).as("n"))
    },

    q("q_graph_expand", "2.3",
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_orders
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_mktsegment""") { (s, d) =>
      // MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN c.mktsegment, count(o)
      val g = graph(s, d)
      val c = Expand.scan(g, "c", Some("Customer"))
      Expand.expand(g, c, "c", "o", Some("PLACED"), Expand.Out, Some("Order"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"))
        .select("segment", "n_orders")
    },

    q("q_graph_expand_incoming", "2.3",
      """SELECT n_name, COUNT(*) AS n_cust
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_name""") { (s, d) =>
      // MATCH (n:Nation)<-[:FROM]-(c:Customer) — incoming direction
      val g = graph(s, d)
      val n = Expand.scan(g, "n", Some("Nation"))
      Expand.expand(g, n, "n", "c", Some("FROM"), Expand.In, Some("Customer"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
    },

    q("q_graph_chain_2hop", "2.3",
      """SELECT c_mktsegment AS segment, %s AS total_qty
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""".format(sqlSum("l_quantity"))) { (s, d) =>
      // MATCH (c:Customer)-[:PLACED]->(o)-[r:CONTAINS]->(p:Part)
      // RETURN c.mktsegment, sum(r.quantity) — chained expand, edge property
      val g = graph(s, d)
      val c = Expand.scan(g, "c", Some("Customer"))
      val co = Expand.expand(g, c, "c", "o", Some("PLACED"), Expand.Out, Some("Order"))
      Expand.expand(g, co, "o", "p", Some("CONTAINS"), Expand.Out, Some("Part"), relVar = Some("r"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(dsum(col("r_weight")).as("total_qty"))
        .select("segment", "total_qty")
    },

    q("q_graph_optional_match", "2.3",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey""") { (s, d) =>
      // OPTIONAL MATCH (c)-[:PLACED]->(o) RETURN c.key, count(o)
      val g = graph(s, d)
      val c = Expand.scan(g, "c", Some("Customer"))
      Expand.expand(g, c, "c", "o", Some("PLACED"), Expand.Out, Some("Order"), optional = true)
        .groupBy(col("c_key").as("c_custkey"))
        .agg(count(col("o_id")).as("n_orders"))
    },

    q("q_graph_top_products", "2.3",
      """SELECT p_name, %s AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_name
         ORDER BY revenue DESC, p_name LIMIT 10""".format(sqlSum("l_extendedprice"))) { (s, d) =>
      // the reference's own benchmark family: "top products by revenue"
      // (BASELINE.md: 4,919 ops/s headline). Edge property extendedprice
      // lives in the string property map — cast roundtrips exactly.
      val g = graph(s, d)
      val p = Expand.scan(g, "p", Some("Part"))
      Expand.expand(g, p, "p", "o", Some("CONTAINS"), Expand.In, Some("Order"), relVar = Some("r"))
        .groupBy(col("p_name"))
        .agg(dsum(element_at(col("r_properties"), "extendedprice").cast("double")).as("revenue"))
        .orderBy(col("revenue").desc, col("p_name").asc)
        .limit(10)
    },

    q("q_graph_var_length", "2.3",
      """SELECT start_id, depth, n FROM (
           SELECT 'Region:' || r_regionkey AS start_id, 1 AS depth, COUNT(*) AS n
           FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_regionkey
           UNION ALL
           SELECT 'Region:' || r_regionkey, 2,
                  (SELECT COUNT(*) FROM customer JOIN nation n2 ON c_nationkey = n2.n_nationkey
                   WHERE n2.n_regionkey = r_regionkey)
                + (SELECT COUNT(*) FROM supplier JOIN nation n3 ON s_nationkey = n3.n_nationkey
                   WHERE n3.n_regionkey = r_regionkey)
           FROM region)""") { (s, d) =>
      // MATCH (r:Region)<-[*1..2]-(x) RETURN r, depth, count(x) — iterative
      // frontier expansion with per-depth dedup
      val g = graph(s, d)
      val starts = g.nodesByLabel("Region").select("id")
      Expand.varLengthExpand(g, starts, None, 1, 2, Expand.In)
        .groupBy(col("start_id"), col("depth"))
        .agg(count(lit(1)).as("n"))
    },

    q("q_graph_shortest_paths", "2.11",
      """SELECT length, n FROM (
           SELECT 0 AS length, COUNT(*) AS n FROM customer
           UNION ALL
           SELECT 1, (SELECT COUNT(*) FROM orders) + (SELECT COUNT(*) FROM customer)
           UNION ALL
           SELECT 2, (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey, l_partkey
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey))
                   + (SELECT COUNT(*) FROM customer))""") { (s, d) =>
      // BFS shortest-path lengths from all customers, maxHops=2
      val g = graph(s, d)
      val starts = g.nodesByLabel("Customer").select("id")
      Expand.shortestPaths(g, starts, None, 2, Expand.Out)
        .groupBy(col("length"))
        .agg(count(lit(1)).as("n"))
    },

    q("q_graph_degree", "2.10",
      """SELECT deg, COUNT(*) AS n_customers FROM (
           SELECT c_custkey, COUNT(o_orderkey) + 1 AS deg
           FROM customer LEFT JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey)
         GROUP BY deg""") { (s, d) =>
      // outDegree() histogram over Customer (orders + the FROM edge)
      val g = graph(s, d)
      val custIds = g.nodesByLabel("Customer").select("id")
      g.degrees("out")
        .join(custIds, Seq("id"))
        .groupBy(col("deg"))
        .agg(count(lit(1)).as("n_customers"))
    },

    q("q_graph_rel_type_scan", "2.1",
      """SELECT rel_type, n FROM (
           SELECT 'PLACED' AS rel_type, COUNT(*) AS n FROM orders
           UNION ALL SELECT 'CONTAINS', COUNT(*) FROM lineitem
           UNION ALL SELECT 'SUPPLIES', COUNT(*) FROM
             (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           UNION ALL SELECT 'FROM', COUNT(*) FROM customer
           UNION ALL SELECT 'LOCATED_IN', COUNT(*) FROM supplier
           UNION ALL SELECT 'IN', COUNT(*) FROM nation)""") { (s, d) =>
      // MATCH ()-[r]->() RETURN type(r), count(*) — relationship-type scan
      graph(s, d).edges
        .groupBy(col("rel_type"))
        .agg(count(lit(1)).as("n"))
    })
}
