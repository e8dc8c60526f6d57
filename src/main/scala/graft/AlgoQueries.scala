package graft

import org.apache.spark.sql.functions._
import graft.algos.Algorithms
import graft.graph.Expand

/** Graph-algorithm surface (SURVEY §2.11). Oracle-checked where the
  * computation is SQL-expressible with bit-stable arithmetic (PageRank with
  * DECIMAL-routed contributions, Bellman-Ford distances via min,
  * link-prediction scores, 2-layer closeness/betweenness); iterative
  * fixpoint algorithms (WCC, LPA, Louvain, FastRP) are rows-only here and
  * property-tested in AlgoSpec.
  */
object AlgoQueries {

  val queries: Map[String, GQuery] = Map(
    "q_algo_pagerank" -> GQuery(
      (s, d) => Algorithms.pageRank(GraphQueries.graph(s, d), 2, exact = true),
      Some(Algorithms.pageRankOracleSql(2)), "2.11"),

    "q_algo_wcc" -> GQuery(
      (s, d) => graft.algos.GraphXAlgos.wcc(GraphQueries.graph(s, d), Some("CONTAINS"))
        .groupBy("component").agg(count(lit(1)).as("n_nodes")),
      None, "2.11"),

    // DataFrame min-propagation variant (no RDDs). PLACED is star-shaped —
    // one component per customer — so min-propagation converges in ~3
    // rounds; deep/chained graphs should use the GraphX variant above.
    // Oracle: component id = lexicographic-min node id = 'Customer:<k>'
    // ('C' < 'O'), size = the customer plus its orders.
    "q_algo_wcc_df" -> GQuery(
      (s, d) => Algorithms.wcc(GraphQueries.graph(s, d), Some("PLACED"))
        .groupBy("component").agg(count(lit(1)).as("n_nodes")),
      Some("""SELECT 'Customer:' || c_custkey AS component,
                     COUNT(*) + 1 AS n_nodes
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_custkey"""), "2.11"),

    // GraphX variants (same semantics as the DataFrame versions, asserted
    // in AlgoSpec): iterations run as in-memory RDD joins on the cached id
    // dictionary instead of per-round Catalyst plans
    "q_algo_label_prop" -> GQuery(
      (s, d) => graft.algos.GraphXAlgos.labelPropagation(
        GraphQueries.graph(s, d), 3, Some("CONTAINS"))
        .groupBy("label").agg(count(lit(1)).as("n_nodes")),
      None, "2.11"),

    "q_algo_louvain" -> GQuery(
      (s, d) => {
        val (comms, q) = graft.algos.GraphXAlgos.louvain(
          GraphQueries.graph(s, d), 3, Some("CONTAINS"))
        comms.groupBy("label").agg(count(lit(1)).as("n_nodes"))
      },
      None, "2.11"),

    "q_algo_dijkstra" -> GQuery(
      (s, d) => Algorithms.dijkstra(GraphQueries.graph(s, d), "Customer:1", 2),
      Some("""SELECT id, dist FROM (
                SELECT 'Customer:1' AS id, 0.0 AS dist
                UNION ALL
                SELECT 'Order:' || o_orderkey, 1.0 FROM orders WHERE o_custkey = 1
                UNION ALL
                SELECT 'Nation:' || c_nationkey, 1.0 FROM customer WHERE c_custkey = 1
                UNION ALL
                SELECT 'Part:' || l_partkey, MIN(1.0 + l_quantity)
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_custkey = 1 GROUP BY l_partkey
                UNION ALL
                SELECT 'Region:' || n_regionkey, 2.0
                FROM nation JOIN customer ON c_nationkey = n_nationkey
                WHERE c_custkey = 1)"""), "2.11"),

    "q_algo_linkpred" -> GQuery(
      (s, d) => Algorithms.linkPrediction(
        Tables.lineitem(s, d).select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct(),
        20L),
      Some("""WITH adj AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
              pdeg AS (SELECT p, COUNT(*) AS pdeg FROM adj GROUP BY p),
              sdeg AS (SELECT s, COUNT(*) AS sdeg FROM adj GROUP BY s),
              pairs AS (
                SELECT a.s AS s1, b.s AS s2, COUNT(*) AS cn,
                       CAST(SUM(CAST(round(1.0 / ln(pdeg), 9) AS DECIMAL(28,12))) AS DOUBLE) AS aa
                FROM adj a
                  JOIN adj b ON a.p = b.p AND a.s < b.s
                  JOIN pdeg ON a.p = pdeg.p
                WHERE a.s <= 20 AND b.s <= 20
                GROUP BY a.s, b.s)
              SELECT s1, s2, cn, aa, d1.sdeg * d2.sdeg AS pa,
                     CAST(cn AS DOUBLE) / (d1.sdeg + d2.sdeg - cn) AS jac
              FROM pairs JOIN sdeg d1 ON s1 = d1.s JOIN sdeg d2 ON s2 = d2.s"""),
      "2.11"),

    // embedding stringified: the driver's pandas row-sort can't hash raw
    // array columns (round-1 compare failure)
    "q_algo_fastrp" -> GQuery(
      (s, d) => Algorithms.fastRP(GraphQueries.graph(s, d), dim = 8,
        iterWeights = Seq(0.0, 1.0), relType = Some("SUPPLIES"))
        .select(col("id"),
          array_join(transform(col("emb"), x => format_string("%.6f", x)), ";").as("emb_str")),
      None, "2.11"),

    "q_algo_closeness" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val lengths = Expand.shortestPaths(g,
          g.nodesByLabel("Region").select("id"), None, 2, Expand.In)
        Algorithms.closeness(lengths)
      },
      Some("""SELECT 'Region:' || r_regionkey AS id,
                CAST(nn + nc + ns AS DOUBLE) / (nn + 2 * (nc + ns)) AS closeness
              FROM (SELECT r_regionkey,
                      (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = region.r_regionkey) AS nn,
                      (SELECT COUNT(*) FROM customer JOIN nation n2 ON c_nationkey = n2.n_nationkey
                       WHERE n2.n_regionkey = region.r_regionkey) AS nc,
                      (SELECT COUNT(*) FROM supplier JOIN nation n3 ON s_nationkey = n3.n_nationkey
                       WHERE n3.n_regionkey = region.r_regionkey) AS ns
                    FROM region)"""), "2.11"),

    "q_algo_betweenness" -> GQuery(
      (s, d) => Algorithms.betweennessTwoHop(GraphQueries.graph(s, d), "FROM", "IN"),
      Some("""SELECT 'Nation:' || c_nationkey AS id, COUNT(*) AS betweenness
              FROM customer GROUP BY c_nationkey"""), "2.11"))
}
