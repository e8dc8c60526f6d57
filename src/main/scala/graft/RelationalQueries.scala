package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OracleSafe._

/** Relational operator surface (SURVEY.md §2.1–§2.7, §2.9): scans,
  * filters/predicates, projections, joins (incl. semi/anti/theta/cross),
  * aggregation, windows, sort/limit/skip, set ops, UNWIND, CASE.
  *
  * Each entry is a Spark plan plus a DuckDB oracle. Money aggregates go
  * through [[OracleSafe]] so hashes are bit-stable across engines.
  */
object RelationalQueries {

  private def q(
      name: String,
      section: String,
      oracle: String)(fn: (SparkSession, String) => DataFrame): (String, GQuery) =
    name -> GQuery(fn, Option(oracle).filter(_.nonEmpty), section)

  val queries: Map[String, GQuery] = Map(
    // ---- §2.1 scans ----------------------------------------------------
    q("q_scan_project", "2.1",
      "SELECT c_custkey, c_name, c_acctbal FROM customer") { (s, d) =>
      Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
    },

    q("q_scan_filter_pushdown", "2.1",
      "SELECT p_partkey, p_name FROM part WHERE p_size >= 40") { (s, d) =>
      // filter + pruning reach the parquet scan (PushedFilters in explain)
      Tables.part(s, d).filter(col("p_size") >= 40).select("p_partkey", "p_name")
    },

    // ---- §2.2 filters / predicates ------------------------------------
    q("q_filter_compound", "2.2",
      """SELECT c_custkey, c_name FROM customer
         WHERE (c_acctbal > 5000 AND c_mktsegment = 'BUILDING')
            OR (c_acctbal < 0 AND NOT c_mktsegment = 'MACHINERY')""") { (s, d) =>
      Tables.customer(s, d)
        .filter((col("c_acctbal") > 5000 && col("c_mktsegment") === "BUILDING") ||
          (col("c_acctbal") < 0 && !(col("c_mktsegment") === "MACHINERY")))
        .select("c_custkey", "c_name")
    },

    q("q_filter_in_between", "2.2",
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
           AND o_totalprice BETWEEN 100000 AND 200000""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(100000, 200000))
        .select("o_orderkey", "o_totalprice")
    },

    q("q_filter_string_ops", "2.2",
      """SELECT p_partkey, p_name FROM part
         WHERE p_name LIKE 's%' AND p_type LIKE '%ECO%' AND p_brand LIKE '%#3'""") { (s, d) =>
      // STARTS WITH / CONTAINS / ENDS WITH (reference: comparison.go string ops)
      Tables.part(s, d)
        .filter(col("p_name").startsWith("s") && col("p_type").contains("ECO") &&
          col("p_brand").endsWith("#3"))
        .select("p_partkey", "p_name")
    },

    q("q_filter_regex", "2.2",
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')""") { (s, d) =>
      // Cypher `=~` regex predicate (full-match anchored both sides)
      Tables.part(s, d).filter(col("p_name").rlike("^(red|blue) (bolt|gear)$"))
        .select("p_partkey", "p_name")
    },

    q("q_filter_null", "2.2",
      """SELECT o_orderkey FROM orders
         WHERE o_orderstatus IS NOT NULL AND o_custkey IS NOT NULL
           AND o_orderkey % 1000 = 0""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isNotNull && col("o_custkey").isNotNull &&
          col("o_orderkey") % 1000 === 0)
        .select("o_orderkey")
    },

    q("q_case_expr", "2.2",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
                COUNT(*) AS n
         FROM orders GROUP BY 1""") { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    },

    // ---- §2.3 joins ----------------------------------------------------
    q("q_join_broadcast_dim", "2.3",
      """SELECT n_name, COUNT(*) AS n_cust, %s AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""".format(sqlSum("c_acctbal"))) { (s, d) =>
      // dim table broadcast: no shuffle of the customer side for the join
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
    },

    q("q_join_multihop", "2.3",
      """SELECT r_name, n_name, COUNT(*) AS n_items, %s AS revenue
         FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""".format(
        sqlSum("l_extendedprice * (1 - l_discount)", 4))) { (s, d) =>
      // star join: facts shuffle once per key, dims broadcast
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    },

    q("q_join_left_outer", "2.3",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey""") { (s, d) =>
      // OPTIONAL MATCH semantics: customers with zero orders kept, count=0
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
    },

    q("q_join_semi", "2.3",
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)""") { (s, d) =>
      // WHERE EXISTS {...} → left_semi
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      Tables.customer(s, d)
        .join(big, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    q("q_join_anti", "2.3",
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""") { (s, d) =>
      // WHERE NOT EXISTS {...} → left_anti
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    q("q_join_theta", "2.3",
      """SELECT n_nationkey, COUNT(*) AS n_pairs
         FROM supplier JOIN customer ON s_nationkey = c_nationkey
                                    AND s_acctbal > c_acctbal
         JOIN nation ON n_nationkey = s_nationkey
         GROUP BY n_nationkey""") { (s, d) =>
      // theta join: equi part keys the shuffle, inequality filters post-match
      val sup = Tables.supplier(s, d)
      val cust = Tables.customer(s, d)
      sup.join(cust, col("s_nationkey") === col("c_nationkey") &&
          col("s_acctbal") > col("c_acctbal"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
        .groupBy("n_nationkey").agg(count(lit(1)).as("n_pairs"))
    },

    q("q_join_cross", "2.3",
      """SELECT a.r_name AS r1, b.r_name AS r2
         FROM region a CROSS JOIN region b WHERE a.r_regionkey < b.r_regionkey""") { (s, d) =>
      // disjoint-pattern cartesian product (match_multi.go:952 analog)
      val a = Tables.region(s, d).select(col("r_regionkey").as("k1"), col("r_name").as("r1"))
      val b = Tables.region(s, d).select(col("r_regionkey").as("k2"), col("r_name").as("r2"))
      a.crossJoin(b).filter(col("k1") < col("k2")).select("r1", "r2")
    },

    q("q_join_self_mutual", "2.3",
      """SELECT COUNT(*) AS n_mutual
         FROM lineitem a JOIN lineitem b
           ON a.l_partkey = b.l_suppkey AND a.l_suppkey = b.l_partkey
              AND a.l_orderkey = b.l_orderkey""") { (s, d) =>
      // mutual-relationship cycle pattern (query_patterns.go:28): self-join
      // with swapped endpoint keys
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey")
      val a = li.toDF("ak", "ap", "as_")
      val b = li.toDF("bk", "bp", "bs")
      a.join(b, col("ap") === col("bs") && col("as_") === col("bp") && col("ak") === col("bk"))
        .agg(count(lit(1)).as("n_mutual"))
    },

    // ---- §2.4 aggregation ---------------------------------------------
    q("q1_agg", "2.4",
      """SELECT l_returnflag, l_linestatus,
                %s AS sum_qty, %s AS sum_base_price, %s AS sum_disc_price,
                %s AS avg_qty, COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""".format(
        sqlSum("l_quantity"), sqlSum("l_extendedprice"),
        sqlSum("l_extendedprice * (1 - l_discount)", 4), sqlAvg("l_quantity"))) { (s, d) =>
      // TPC-H Q1 family — the reference's weak spot (SUM+GROUP BY 0.63×,
      // BASELINE.md) where codegen hash aggregation should win
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    q("q_agg_distinct", "2.4",
      """SELECT o_orderpriority,
                COUNT(DISTINCT o_custkey) AS n_cust,
                COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderpriority""") { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
    },

    q("q_agg_minmax", "2.4",
      """SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
                MAX(l_extendedprice) AS max_price,
                MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
         FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(min("l_extendedprice").as("min_price"), max("l_extendedprice").as("max_price"),
          min("l_shipdate").as("first_ship"), max("l_shipdate").as("last_ship"))
    },

    q("q_agg_collect", "2.4",
      """SELECT n_regionkey, array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
         FROM nation GROUP BY n_regionkey""") { (s, d) =>
      // collect(DISTINCT x) — sorted then joined to a string: the driver's
      // pandas row-sort can't hash raw array columns (round-1 failure)
      Tables.nation(s, d).groupBy("n_regionkey")
        .agg(array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"))
    },

    q("q_agg_global", "2.4",
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
                %s AS total FROM lineitem""".format(sqlSum("l_extendedprice"))) { (s, d) =>
      // single-group aggregation (match_aggregation.go:278 analog)
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("l_orderkey")).as("n_orders"),
          dsum(col("l_extendedprice")).as("total"))
    },

    q("q_agg_having", "2.4",
      """SELECT o_custkey, COUNT(*) AS n FROM orders
         GROUP BY o_custkey HAVING COUNT(*) >= 20""") { (s, d) =>
      // WITH ... WHERE post-aggregation filter (HAVING analog)
      Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)
    },

    // ---- §2.5 windows --------------------------------------------------
    q("q_window_topk_per_group", "2.5",
      """SELECT c_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""") { (s, d) =>
      // top-K per group: the reference expresses this as ORDER BY+LIMIT per
      // entity; one shuffle + in-partition sort here
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    },

    q("q_window_running_sum", "2.5",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                  PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS running_qty
         FROM lineitem WHERE l_suppkey <= 10""") { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d).filter(col("l_suppkey") <= 10)
        .withColumn("running_qty",
          sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },

    q("q_window_lag", "2.5",
      """SELECT user_id, event_id,
                event_id - LAG(event_id) OVER (
                  PARTITION BY user_id ORDER BY event_id) AS delta
         FROM events WHERE user_id <= 20""") { (s, d) =>
      // LAG over per-user ordered events (temporal co-access analog)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, d).filter(col("user_id") <= 20)
        .withColumn("delta", col("event_id") - lag(col("event_id"), 1).over(w))
        .select("user_id", "event_id", "delta")
    },

    // ---- §2.6 sort / limit / skip -------------------------------------
    q("q_sort_limit", "2.6",
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""") { (s, d) =>
      // TakeOrderedAndProject: no global sort materialization
      Tables.orders(s, d).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice").limit(100)
    },

    q("q_sort_skip_limit", "2.6",
      """SELECT c_custkey, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey LIMIT 50 OFFSET 100""") { (s, d) =>
      Tables.customer(s, d).orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .select("c_custkey", "c_acctbal").offset(100).limit(50)
    },

    q("q_distinct", "2.6",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") { (s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // ---- §2.7 set operations ------------------------------------------
    q("q_union_distinct", "2.7",
      """SELECT c_nationkey AS nationkey FROM customer
         UNION SELECT s_nationkey FROM supplier""") { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct()
    },

    q("q_union_all", "2.7",
      """SELECT nationkey, COUNT(*) AS n FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier)
         GROUP BY nationkey""") { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
    },

    q("q_intersect", "2.7",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
         INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000""") { (s, d) =>
      Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey").as("nationkey")))
    },

    q("q_except", "2.7",
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal < 0""") { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_nationkey").as("nationkey")))
    },

    // ---- §2.9 UNWIND / pipeline combinators ---------------------------
    q("q_unwind_explode", "2.9",
      """SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
         GROUP BY word""") { (s, d) =>
      // UNWIND list → rows (clauses.go:300 analog)
      Tables.part(s, d)
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
    },

    q("q_with_pipeline", "2.9",
      """SELECT o_orderstatus, COUNT(*) AS n_big, %s AS avg_price FROM (
           SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 100000)
         GROUP BY o_orderstatus""".format(sqlAvg("o_totalprice"))) { (s, d) =>
      // WITH-stage chaining: filter → project → re-aggregate
      Tables.orders(s, d).filter(col("o_totalprice") > 100000)
        .select("o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_big"), davg(col("o_totalprice")).as("avg_price"))
    },

    q("q_scalar_subquery", "2.9",
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal > (SELECT %s FROM customer)""".format(
        sqlAvg("c_acctbal", 2))) { (s, d) =>
      // scalar-subquery analog; both sides route the mean through decimal so
      // the comparison threshold is bit-identical across engines
      val cust = Tables.customer(s, d)
      val mean = cust.agg(davg(col("c_acctbal"), 2).as("m"))
      cust.crossJoin(broadcast(mean)).filter(col("c_acctbal") > col("m"))
        .select("c_custkey", "c_acctbal")
    })
}
