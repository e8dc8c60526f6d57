package graft

import org.apache.spark.sql.functions._
import graft.graph.Expand
import graft.operators.{Audit, PathExpand, Retention}
import graft.search.Eval
import graft.sources.{Formats, PackStream, ResultJson}
import OracleSafe._

/** Round-1 extension batch: apoc.path expanders, grouping sets, format
  * round-trips, Cypher EXPLAIN, IR eval harness.
  */
object ExtQueries {

  /** Recursively delete a per-query temp directory (checkpoint/WAL
    * payloads are not auto-cleaned by Spark, and bench reps would
    * otherwise leak unbounded /tmp data — round-13 verdict item #4).
    */
  private[graft] def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } finally stream.close()
    }
  }

  /** Quality floors for the ANN eval verdict rows — set with margin below
    * the measured sf0.001/sf0.01 macros (raw values asserted in
    * SearchPipelineSpec); a tier regressing under its floor turns the
    * correctness row red.
    */
  val evalLshBounds: Seq[(String, Double)] =
    Seq("recall_at_k" -> 0.5, "ndcg_at_k" -> 0.45, "precision_at_k" -> 0.5)
  val evalIvfBounds: Seq[(String, Double)] =
    Seq("recall_at_k" -> 0.4, "ndcg_at_k" -> 0.5)

  val queries: Map[String, GQuery] = Map(
    // MCP task lifecycle (mcp/server.go:784-1022) replayed over a
    // deterministic task graph derived from orders: one auto-toggle step
    // (pending→active→completed) + the unblocked_only dependency filter
    // (anti-join on DEPENDS_ON targets that aren't completed) — shared
    // TaskOps semantics with the live `task`/`tasks` tools
    "q_mcp_tasks_lifecycle" -> GQuery(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.orders(s, d).filter(col("o_orderkey") < 500)
          .select(row_number().over(
            Window.orderBy("o_orderkey")).cast("long").as("id"))
        val tasks = t
          .withColumn("status",
            element_at(array(lit("pending"), lit("active"),
              lit("completed"), lit("blocked")),
              (pmod(col("id"), lit(4)) + 1).cast("int")))
          .withColumn("priority",
            element_at(array(lit("critical"), lit("high"), lit("medium"),
              lit("low"), lit("medium")),
              (pmod(col("id"), lit(5)) + 1).cast("int")))
        val deps = tasks.filter(pmod(col("id"), lit(3)) === 0 && col("id") > 1)
          .select(col("id").as("src"), (col("id") - 1).as("dst"))
        val blocked = graft.operators.TaskOps.blockedIds(tasks, deps)
          .withColumn("is_blocked", lit(true))
        tasks.join(blocked, Seq("id"), "left_outer")
          .select(col("id").as("task_id"), col("status"), col("priority"),
            graft.operators.TaskOps.toggled(col("status")).as("toggled"),
            coalesce(!col("is_blocked"), lit(true)).as("unblocked"))
      },
      Some("""WITH t AS (
                SELECT row_number() OVER (ORDER BY o_orderkey) AS id
                FROM orders WHERE o_orderkey < 500),
              tasks AS (
                SELECT id,
                  CASE id % 4 WHEN 0 THEN 'pending' WHEN 1 THEN 'active'
                    WHEN 2 THEN 'completed' ELSE 'blocked' END AS status,
                  CASE id % 5 WHEN 0 THEN 'critical' WHEN 1 THEN 'high'
                    WHEN 2 THEN 'medium' WHEN 3 THEN 'low'
                    ELSE 'medium' END AS priority
                FROM t),
              deps AS (
                SELECT id AS src, id - 1 AS dst
                FROM tasks WHERE id % 3 = 0 AND id > 1)
              SELECT ts.id AS task_id, ts.status, ts.priority,
                CASE WHEN ts.status IN ('pending', '') THEN 'active'
                     WHEN ts.status = 'active' THEN 'completed'
                     ELSE ts.status END AS toggled,
                NOT EXISTS (
                  SELECT 1 FROM deps d JOIN tasks dt ON dt.id = d.dst
                  WHERE d.src = ts.id AND dt.status <> 'completed') AS unblocked
              FROM tasks ts"""), "2.11"),

    "q_path_subgraph_nodes" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        PathExpand.subgraphNodes(g, g.nodesByLabel("Region").select("id"), 2,
          None, Some("Customer"), Expand.In)
          .groupBy("start_id").agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT 'Region:' || n_regionkey AS start_id, COUNT(*) AS n_customers
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_regionkey"""), "2.11"),

    // all shortest paths Customer:102 → Part:1784 (3 distinct 2-hop paths
    // through different orders at sf0.01; the oracle enumerates them)
    "q_path_all_shortest" -> GQuery(
      (s, d) => Expand.allShortestPaths(GraphQueries.graph(s, d),
        "Customer:102", "Part:1784", None, 4)
        .select(array_join(col("path"), ">").as("path"), col("length")),
      Some("""SELECT DISTINCT 'Customer:102>Order:' || o_orderkey || '>Part:1784' AS path,
                     CAST(2 AS INT) AS length
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_custkey = 102 AND l_partkey = 1784"""), "2.3"),

    // multi-DB management surface (executor_show.go:237,
    // composite_commands.go): a catalog with two tenants, an alias, and a
    // composite database; SHOW DATABASES projected to its stable columns
    "q_cypher_show_databases" -> GQuery(
      (s, d) => {
        val cat = new graft.cypher.DatabaseCatalog(GraphQueries.graph(s, d))
        cat.execute("CREATE DATABASE tenant_a")
        cat.execute("CREATE DATABASE tenant_b")
        cat.execute("CREATE ALIAS prod FOR DATABASE tenant_a")
        cat.execute("""CREATE COMPOSITE DATABASE analytics
          ALIAS ta FOR DATABASE tenant_a ALIAS tb FOR DATABASE tenant_b""")
        cat.execute("SHOW DATABASES")
          .select(col("name"), col("type"), col("access"), col("role"),
            col("writer"), col("default"),
            array_join(col("constituents"), ",").as("constituents"))
      },
      Some("""SELECT * FROM (VALUES
          ('neo4j', 'standard', 'read-write', 'primary', TRUE, TRUE, ''),
          ('tenant_a', 'standard', 'read-write', 'primary', TRUE, FALSE, ''),
          ('tenant_b', 'standard', 'read-write', 'primary', TRUE, FALSE, ''),
          ('analytics', 'composite', 'read-write', 'primary', TRUE, FALSE, 'ta,tb'))
          AS t(name, type, access, role, writer, "default", constituents)"""),
      "2.9"),

    // apoc.algo.allSimplePaths Customer:102 → Part:1784: on this layered
    // graph every simple path goes Customer→Order→Part, so the oracle can
    // enumerate them; the cycle/no-repeat machinery is exercised on a
    // cyclic fixture in Round3FeatureSpec
    "q_path_all_simple" -> GQuery(
      (s, d) => graft.algos.BfsRdd.allSimplePaths(GraphQueries.graph(s, d),
        "Customer:102", "Part:1784", Nil, 4)
        .select(array_join(col("path"), ">").as("path"), col("length")),
      Some("""SELECT DISTINCT 'Customer:102>Order:' || o_orderkey || '>Part:1784' AS path,
                     CAST(2 AS INT) AS length
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_custkey = 102 AND l_partkey = 1784"""), "2.11"),

    "q_path_neighbors_byhop" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        PathExpand.neighborsByHop(g, g.nodesByLabel("Region").select("id"), 2,
          None, Expand.In)
      },
      Some("""SELECT 'Region:' || r_regionkey AS start_id, 1 AS hop,
                     (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey = region.r_regionkey) AS n_nodes
              FROM region
              UNION ALL
              SELECT 'Region:' || r_regionkey, 2,
                     (SELECT COUNT(*) FROM customer JOIN nation n2 ON c_nationkey = n2.n_nationkey
                      WHERE n2.n_regionkey = region.r_regionkey)
                   + (SELECT COUNT(*) FROM supplier JOIN nation n3 ON s_nationkey = n3.n_nationkey
                      WHERE n3.n_regionkey = region.r_regionkey)
              FROM region"""), "2.11"),

    "q_path_spanning_tree" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        PathExpand.spanningTree(g, "Customer:1", 2, None)
      },
      // parents on shortest paths from Customer:1 within 2 hops, min parent
      Some("""SELECT id AS node_id, parent, length FROM (
                SELECT 'Order:' || o_orderkey AS id, 'Customer:1' AS parent, 1 AS length
                FROM orders WHERE o_custkey = 1
                UNION ALL
                SELECT 'Nation:' || c_nationkey, 'Customer:1', 1
                FROM customer WHERE c_custkey = 1
                UNION ALL
                SELECT 'Part:' || l_partkey, MIN('Order:' || l_orderkey), 2
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_custkey = 1 GROUP BY l_partkey
                UNION ALL
                SELECT 'Region:' || n_regionkey, MIN('Nation:' || n_nationkey), 2
                FROM nation JOIN customer ON c_nationkey = n_nationkey
                WHERE c_custkey = 1 GROUP BY n_regionkey)"""), "2.11"),

    "q_agg_rollup" -> GQuery(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                      ${sqlSum("l_quantity")} AS qty
               FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
      "2.4"),

    "q_agg_cube" -> GQuery(
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""),
      "2.4"),

    // bucketed co-located join (SURVEY §4): lineitem+orders written
    // bucketBy(order key) once, the join then plans with NO Exchange on
    // either side (spec-asserted) — the layout decision that turns the
    // repeated fact join from a full shuffle into a per-bucket merge
    "q_source_bucketed_join" -> GQuery(
      (s, d) => graft.sources.Bucketing.revenueByPriority(s, d),
      Some("""SELECT o_orderpriority, SUM(l_quantity) AS total_qty,
                     COUNT(*) AS n_items
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority"""),
      "2.1"),

    "q_source_json_roundtrip" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val path = s"/tmp/graft_export/nation_json"
        val exported = Formats.exportNodesJson(g, Some("Nation"), path)
        val back = Formats.importNodesJson(s, path).count()
        import s.implicits._
        Seq((exported, back)).toDF("n_exported", "n_imported")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_exported,
                     CAST(COUNT(*) AS BIGINT) AS n_imported FROM nation"""),
      "2.1"),

    "q_source_csv_roundtrip" -> GQuery(
      (s, d) => {
        val path = s"/tmp/graft_export/region_csv"
        val exported = Formats.exportCsv(Tables.region(s, d), path)
        val back = Formats.loadCsv(s, path)
        import s.implicits._
        Seq((exported, back.count(),
          back.agg(sum("r_regionkey")).collect()(0).getLong(0)))
          .toDF("n_exported", "n_imported", "key_sum")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_exported,
                     CAST(COUNT(*) AS BIGINT) AS n_imported,
                     CAST(SUM(r_regionkey) AS BIGINT) AS key_sum FROM region"""),
      "2.1"),

    "q_cypher_explain" -> GQuery(
      (s, d) => {
        import s.implicits._
        graft.cypher.ExplainCypher.operators(
          """MATCH (c:Customer)-[:PLACED]->(o:Order)
             WHERE c.acctbal > 0
             RETURN c.mktsegment AS seg, count(o) AS n
             ORDER BY n DESC LIMIT 5""")
          .zipWithIndex.map { case (op, i) => (i, op) }.toDF("step", "operator")
      },
      Some("""SELECT * FROM (VALUES
                (0, 'NodeByLabelScan(:Customer)'),
                (1, 'Expand(:PLACED)'),
                (2, 'Filter(:Order)'),
                (3, 'Filter'),
                (4, 'EagerAggregation'),
                (5, 'Sort'),
                (6, 'Limit'),
                (7, 'ProduceResults')) t(step, operator)"""), "2.9"),

    // IR metrics for the LSH index vs brute-force truth, emitted as
    // driver-checkable (metric, threshold, pass) verdict rows — the raw
    // float macros are reassociative (no SQL replay) but the PASS verdict
    // is deterministic and hash-compares against a VALUES oracle. Raw
    // values still asserted in SearchPipelineSpec.
    "q_eval_ann_quality" -> GQuery(
      (s, d) => Eval.passRows(
        Eval.annVsBrute(s, Tables.embeddings(s, d), 20, 10, 4, 8),
        "lsh", evalLshBounds),
      Some(Eval.passRowsOracle("lsh", evalLshBounds)), "2.11"),

    // same harness over the IVF tier at nProbe=4 of 16 lists
    "q_eval_ivf_quality" -> GQuery(
      (s, d) => Eval.passRows(
        Eval.ivfVsBrute(s, Tables.embeddings(s, d), 20, 10, 16, 4),
        "ivf", evalIvfBounds),
      Some(Eval.passRowsOracle("ivf", evalIvfBounds)), "2.11"),

    // full write pipeline through the Cypher string surface on a fresh
    // store: CREATE per UNWIND row → MERGE (2 of 5 new) → per-row SET →
    // DETACH DELETE. The oracle pins the exact QueryStats the reference's
    // merge/create semantics would produce.
    "q_cypher_write_cycle" -> GQuery(
      (s, d) => {
        import graft.cypher.CypherWrite
        import graft.graph.GraphStore
        val store = new GraphStore(GraphQueries.graph(s, d))
        val w1 = CypherWrite.execute(store,
          "UNWIND [9001, 9002, 9003] AS k CREATE (p:Person {key: k, name: toString(k)})")
        val w2 = CypherWrite.execute(store,
          "UNWIND [9001, 9002, 9003, 9004, 9005] AS k MERGE (p:Person {key: k})")
        val w3 = CypherWrite.execute(store,
          "MATCH (p:Person) SET p.acctbal = p.key * 2")
        val w4 = CypherWrite.execute(store,
          "MATCH (p:Person) DETACH DELETE p")
        import s.implicits._
        Seq((w1.nodesCreated, w2.nodesCreated, w3.propertiesSet, w4.nodesDeleted))
          .toDF("created_1", "created_2", "props_set", "deleted")
      },
      Some("""SELECT CAST(3 AS BIGINT) AS created_1, CAST(2 AS BIGINT) AS created_2,
                     CAST(5 AS BIGINT) AS props_set, CAST(5 AS BIGINT) AS deleted"""),
      "2.8"),

    // the same cycle with EVERY store pin routed through reliable
    // checkpoint() (spark.graft.checkpointDir — the round-12 scale
    // option): driver-checks the fault-tolerant pin path end-to-end,
    // which the 276-row corpus otherwise never reaches
    // (Round12CheckpointSpec covers block-loss survival; this row pins
    // the QueryStats contract under the reliable route)
    "q_cypher_write_cycle_ckpt" -> GQuery(
      (s, d) => {
        import graft.cypher.CypherWrite
        import graft.graph.GraphStore
        val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-q").toString
        val prev = s.conf.getOption("spark.graft.checkpointDir")
        s.conf.set("spark.graft.checkpointDir", dir)
        try {
          val store = new GraphStore(GraphQueries.graph(s, d), registerGlobal = false)
          val w1 = CypherWrite.execute(store,
            "UNWIND [9001, 9002, 9003] AS k CREATE (p:Person {key: k, name: toString(k)})")
          val w2 = CypherWrite.execute(store,
            "UNWIND [9001, 9002, 9003, 9004, 9005] AS k MERGE (p:Person {key: k})")
          val w3 = CypherWrite.execute(store,
            "MATCH (p:Person) SET p.acctbal = p.key * 2")
          val w4 = CypherWrite.execute(store,
            "MATCH (p:Person) DETACH DELETE p")
          import s.implicits._
          Seq((w1.nodesCreated, w2.nodesCreated, w3.propertiesSet, w4.nodesDeleted))
            .toDF("created_1", "created_2", "props_set", "deleted")
        } finally {
          // single-threaded bench/verify runner makes this conf swap safe;
          // concurrent queries in one session would race on the shared key
          prev match {
            case Some(p) => s.conf.set("spark.graft.checkpointDir", p)
            case None => s.conf.unset("spark.graft.checkpointDir")
          }
          deleteRecursively(dir)
        }
      },
      Some("""SELECT CAST(3 AS BIGINT) AS created_1, CAST(2 AS BIGINT) AS created_2,
                     CAST(5 AS BIGINT) AS props_set, CAST(5 AS BIGINT) AS deleted"""),
      "2.8"),

    // the same write pipeline against a WAL-backed store: each statement
    // appends a delta commit of only its touched rows, and recovery
    // (loadWal = newest checkpoint + delta tail) reproduces the state —
    // the incremental-commit path (pkg/storage/wal_engine.go:28-45)
    // driver-checked end-to-end
    "q_cypher_write_wal" -> GQuery(
      (s, d) => {
        import graft.cypher.CypherWrite
        import graft.graph.{DeltaLog, GraphStore, PropertyGraph}
        val dir = java.nio.file.Files.createTempDirectory("graft-wal-q").toString
        try {
        val base = GraphQueries.graph(s, d)
        val store = new GraphStore(PropertyGraph(
          base.nodes.filter("false").localCheckpoint(true),
          base.edges.filter("false").localCheckpoint(true)),
          registerGlobal = false, walDir = Some(dir), compactEvery = 50)
        val w1 = CypherWrite.execute(store,
          "UNWIND [9001, 9002, 9003] AS k CREATE (p:Person {key: k, name: toString(k)})")
        val w2 = CypherWrite.execute(store,
          "UNWIND [9001, 9002, 9003, 9004, 9005] AS k MERGE (p:Person {key: k})")
        val w3 = CypherWrite.execute(store,
          "MATCH (p:Person) SET p.acctbal = p.key * 2")
        val re = GraphStore.loadWal(s, dir, registerGlobal = false)
        val log = new DeltaLog(s, dir)
        val cs = log.commits()
        import s.implicits._
        Seq((w1.nodesCreated, w2.nodesCreated, w3.propertiesSet,
          cs.count(_.kind == "delta").toLong, cs.count(_.kind == "checkpoint").toLong,
          re.snapshot.nodes.count(),
          re.snapshot.nodes.agg(org.apache.spark.sql.functions.sum("acctbal"))
            .collect()(0).getDouble(0)))
          .toDF("created_1", "created_2", "props_set",
            "delta_commits", "checkpoints", "replayed_nodes", "replayed_acct_sum")
        // all reads above are eager (count/collect), so the WAL dir is
        // no longer referenced by the returned driver-local frame
        } finally deleteRecursively(dir)
      },
      Some("""SELECT CAST(3 AS BIGINT) AS created_1, CAST(2 AS BIGINT) AS created_2,
                     CAST(5 AS BIGINT) AS props_set, CAST(3 AS BIGINT) AS delta_commits,
                     CAST(1 AS BIGINT) AS checkpoints, CAST(5 AS BIGINT) AS replayed_nodes,
                     CAST(90030.0 AS DOUBLE) AS replayed_acct_sum"""),
      "2.8"))
}

/** Metadata-procedure surface (SURVEY §2.11 catalog rows). */
object ProcQueries {
  import graft.graph.Procedures

  val queries: Map[String, GQuery] = Map(
    "q_proc_db_labels" -> GQuery(
      (s, d) => Procedures.dbLabels(GraphQueries.graph(s, d)),
      Some("""SELECT label, n_nodes FROM (
                SELECT 'Customer' AS label, COUNT(*) AS n_nodes FROM customer
                UNION ALL SELECT 'Order', COUNT(*) FROM orders
                UNION ALL SELECT 'Part', COUNT(*) FROM part
                UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
                UNION ALL SELECT 'Nation', COUNT(*) FROM nation
                UNION ALL SELECT 'Region', COUNT(*) FROM region)"""), "2.11"),

    "q_proc_rel_types" -> GQuery(
      (s, d) => Procedures.dbRelationshipTypes(GraphQueries.graph(s, d)),
      Some("""SELECT rel_type, n_rels FROM (
                SELECT 'PLACED' AS rel_type, COUNT(*) AS n_rels FROM orders
                UNION ALL SELECT 'CONTAINS', COUNT(*) FROM lineitem
                UNION ALL SELECT 'SUPPLIES', COUNT(*) FROM
                  (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
                UNION ALL SELECT 'FROM', COUNT(*) FROM customer
                UNION ALL SELECT 'LOCATED_IN', COUNT(*) FROM supplier
                UNION ALL SELECT 'IN', COUNT(*) FROM nation)"""), "2.11"),

    "q_proc_schema_viz" -> GQuery(
      (s, d) => Procedures.schemaVisualization(GraphQueries.graph(s, d)),
      Some("""SELECT * FROM (VALUES
                ('Customer', 'PLACED', 'Order'),
                ('Order', 'CONTAINS', 'Part'),
                ('Supplier', 'SUPPLIES', 'Part'),
                ('Customer', 'FROM', 'Nation'),
                ('Supplier', 'LOCATED_IN', 'Nation'),
                ('Nation', 'IN', 'Region')) t(src_label, rel_type, dst_label)"""),
      "2.11"),

    // db.schema.nodeTypeProperties / relTypeProperties — Neo4j schema
    // introspection (the SHOW PROCEDURES rows executor_show.go:45-46):
    // per-(label, property) types + mandatory flags; TPC-H has no nulls,
    // so the expected table is static (Supplier/Nation/Region drop their
    // always-null hoisted columns entirely)
    "q_proc_node_type_props" -> GQuery(
      (s, d) => Procedures.nodeTypeProperties(GraphQueries.graph(s, d))
        .select(col("nodeType"),
          element_at(col("nodeLabels"), 1).as("label"), col("propertyName"),
          element_at(col("propertyTypes"), 1).as("ptype"), col("mandatory")),
      Some("""SELECT * FROM (VALUES
                (':`Customer`', 'Customer', 'key', 'Long', true),
                (':`Customer`', 'Customer', 'name', 'String', true),
                (':`Customer`', 'Customer', 'acctbal', 'Double', true),
                (':`Customer`', 'Customer', 'mktsegment', 'String', true),
                (':`Order`', 'Order', 'key', 'Long', true),
                (':`Order`', 'Order', 'name', 'String', true),
                (':`Order`', 'Order', 'acctbal', 'Double', true),
                (':`Order`', 'Order', 'mktsegment', 'String', true),
                (':`Order`', 'Order', 'orderstatus', 'String', true),
                (':`Order`', 'Order', 'orderdate', 'String', true),
                (':`Part`', 'Part', 'key', 'Long', true),
                (':`Part`', 'Part', 'name', 'String', true),
                (':`Part`', 'Part', 'acctbal', 'Double', true),
                (':`Part`', 'Part', 'mktsegment', 'String', true),
                (':`Part`', 'Part', 'type', 'String', true),
                (':`Part`', 'Part', 'size', 'String', true),
                (':`Supplier`', 'Supplier', 'key', 'Long', true),
                (':`Supplier`', 'Supplier', 'name', 'String', true),
                (':`Supplier`', 'Supplier', 'acctbal', 'Double', true),
                (':`Nation`', 'Nation', 'key', 'Long', true),
                (':`Nation`', 'Nation', 'name', 'String', true),
                (':`Region`', 'Region', 'key', 'Long', true),
                (':`Region`', 'Region', 'name', 'String', true))
              t(nodeType, label, propertyName, ptype, mandatory)"""),
      "2.11"),

    "q_proc_rel_type_props" -> GQuery(
      (s, d) => Procedures.relTypeProperties(GraphQueries.graph(s, d))
        .select(col("relType"), col("propertyName"),
          element_at(col("propertyTypes"), 1).as("ptype"), col("mandatory")),
      Some("""SELECT * FROM (VALUES
                (':`CONTAINS`', 'quantity', 'String', true),
                (':`CONTAINS`', 'extendedprice', 'String', true))
              t(relType, propertyName, ptype, mandatory)"""),
      "2.11"),

    "q_proc_property_keys" -> GQuery(
      (s, d) => Procedures.dbPropertyKeys(GraphQueries.graph(s, d)),
      Some("""SELECT property_key FROM (VALUES ('key'), ('name'), ('acctbal'),
                ('mktsegment'), ('quantity'), ('extendedprice'),
                ('orderstatus'), ('orderdate'), ('type'), ('size')) t(property_key)"""),
      "2.11"),

    // db.index.stats over DDL-created indexes (storage/schema.go:1142-1178:
    // totalEntries = indexed entities, uniqueValues = distinct values,
    // selectivity = unique/total) — the per-index aggregation is replayed
    // on the raw tables
    "q_proc_index_stats" -> GQuery(
      (s, d) => {
        val store = new graft.graph.GraphStore(GraphQueries.graph(s, d))
        graft.cypher.CypherDdl.tryExecute(store,
          "CREATE INDEX cust_seg_idx FOR (n:Customer) ON (n.mktsegment)")
        graft.cypher.CypherDdl.tryExecute(store,
          "CREATE INDEX part_brand_idx FOR (n:Part) ON (n.mktsegment)")
        graft.cypher.Cypher.run(store.snapshot,
          """CALL db.index.stats()
             YIELD name, type, label, property, totalEntries, uniqueValues, selectivity
             RETURN name, type, label, property, totalEntries, uniqueValues, selectivity""")
      },
      Some("""SELECT * FROM (
                SELECT 'cust_seg_idx' AS name, 'RANGE' AS type, 'Customer' AS label,
                       'mktsegment' AS property,
                       COUNT(c_mktsegment) AS totalEntries,
                       COUNT(DISTINCT c_mktsegment) AS uniqueValues,
                       CAST(COUNT(DISTINCT c_mktsegment) AS DOUBLE) /
                         CAST(COUNT(c_mktsegment) AS DOUBLE) AS selectivity
                FROM customer
                UNION ALL
                SELECT 'part_brand_idx', 'RANGE', 'Part', 'mktsegment',
                       COUNT(p_brand), COUNT(DISTINCT p_brand),
                       CAST(COUNT(DISTINCT p_brand) AS DOUBLE) /
                         CAST(COUNT(p_brand) AS DOUBLE)
                FROM part)"""), "2.11"),

    // db.schema.nodeProperties (call.go:1074-1103): label × property-key
    // inventory — the loader contract makes the expected set closed-form
    "q_proc_schema_node_props" -> GQuery(
      (s, d) => graft.cypher.Cypher.run(GraphQueries.graph(s, d),
        """CALL db.schema.nodeProperties()
           YIELD nodeLabel, propertyName, propertyType
           RETURN nodeLabel, propertyName, propertyType"""),
      Some("""SELECT nodeLabel, propertyName, 'ANY' AS propertyType FROM (VALUES
                ('Customer','key'),('Customer','name'),('Customer','acctbal'),('Customer','mktsegment'),
                ('Order','key'),('Order','name'),('Order','acctbal'),('Order','mktsegment'),
                ('Order','orderstatus'),('Order','orderdate'),
                ('Part','key'),('Part','name'),('Part','acctbal'),('Part','mktsegment'),
                ('Part','type'),('Part','size'),
                ('Supplier','key'),('Supplier','name'),('Supplier','acctbal'),('Supplier','mktsegment'),
                ('Nation','key'),('Nation','name'),('Nation','acctbal'),('Nation','mktsegment'),
                ('Region','key'),('Region','name'),('Region','acctbal'),('Region','mktsegment'))
              t(nodeLabel, propertyName)"""), "2.11"),

    // db.schema.relProperties (call.go:1105-1131)
    "q_proc_schema_rel_props" -> GQuery(
      (s, d) => graft.cypher.Cypher.run(GraphQueries.graph(s, d),
        """CALL db.schema.relProperties()
           YIELD relType, propertyName, propertyType
           RETURN relType, propertyName, propertyType"""),
      Some("""SELECT relType, propertyName, 'ANY' AS propertyType FROM (VALUES
                ('PLACED','weight'),('CONTAINS','weight'),('CONTAINS','quantity'),
                ('CONTAINS','extendedprice'),('SUPPLIES','weight'),('FROM','weight'),
                ('LOCATED_IN','weight'),('IN','weight')) t(relType, propertyName)"""),
      "2.11"),

    // nornicdb.stats (call.go:981-994): totals + distinct label/type counts
    "q_proc_nornicdb_stats" -> GQuery(
      (s, d) => graft.cypher.Cypher.run(GraphQueries.graph(s, d),
        """CALL nornicdb.stats()
           YIELD nodes, relationships, labels, relationshipTypes
           RETURN nodes, relationships, labels, relationshipTypes"""),
      Some("""SELECT
                (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
                + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS nodes,
                (SELECT COUNT(*) FROM orders) + (SELECT COUNT(*) FROM lineitem)
                + (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
                + (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM nation) AS relationships,
                CAST(6 AS BIGINT) AS labels,
                CAST(6 AS BIGINT) AS relationshipTypes"""), "2.11"),

    // the dbms.* compat surface: live procedure-registry membership plus
    // the fixed-contract listing sizes (call.go:1159-1210, call_compat.go)
    "q_proc_dbms_surface" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        import org.apache.spark.sql.functions.{broadcast => bc}
        val p = graft.cypher.Cypher.run(g, "CALL dbms.procedures() YIELD name RETURN name")
          .agg(
            max(when(col("name") === "db.indexes", 1).otherwise(0)).as("has_db_indexes"),
            max(when(col("name") === "tx.setmetadata", 1).otherwise(0)).as("has_tx_setmetadata"),
            max(when(col("name") === "db.stats.retrieveallanthestats", 1).otherwise(0))
              .as("has_stats_retrieve_all"))
        val f = graft.cypher.Cypher.run(g, "CALL dbms.functions() YIELD name RETURN name")
          .agg(count(lit(1)).as("n_functions"))
        val c = graft.cypher.Cypher.run(g, "CALL dbms.listConfig() YIELD name RETURN name")
          .agg(count(lit(1)).as("n_config"))
        p.crossJoin(bc(f)).crossJoin(bc(c))
      },
      Some("""SELECT 1 AS has_db_indexes, 1 AS has_tx_setmetadata,
                     1 AS has_stats_retrieve_all,
                     CAST(22 AS BIGINT) AS n_functions, CAST(3 AS BIGINT) AS n_config"""),
      "2.11"),

    // gds.graph.project through the CALL surface: a named cached
    // (Customer, PLACED) projection; YIELD carries the counts out
    "q_cypher_gds_project" -> GQuery(
      (s, d) => {
        val nm = s"proj_${StreamingQueriesImpl.runCounter.incrementAndGet()}"
        graft.cypher.Cypher.run(GraphQueries.graph(s, d),
          s"""CALL gds.graph.project('$nm', 'Customer', 'PLACED')
              YIELD nodeCount, relationshipCount
              RETURN nodeCount, relationshipCount""")
      },
      Some("""SELECT (SELECT COUNT(*) FROM customer) AS nodeCount,
                     (SELECT COUNT(*) FROM orders) AS relationshipCount"""), "2.11"),

    // the CALL-surface twin of q_cypher_periodic_iterate below: same
    // engine, invoked as CALL apoc.periodic.iterate(outer, inner, config)
    // through the Cypher string, returning the summary row
    "q_cypher_apoc_periodic_call" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        new graft.graph.GraphStore(g) // fresh store = the CALL's write target
        graft.cypher.Cypher.run(g,
          """CALL apoc.periodic.iterate('MATCH (r:Region) RETURN r',
               'SET r.acctbal = 1', {batchSize: 2})
             YIELD batches, total, operations
             RETURN batches, total, operations""")
      },
      Some("""SELECT CAST(ceil(COUNT(*) / 2.0) AS BIGINT) AS batches,
                     COUNT(*) AS total, COUNT(*) AS operations FROM region"""),
      "2.11"),

    // registry coverage proof: apoc.help('') lists the full 983-name APOC
    // surface (ApocCatalog; every member probe-asserted in ApocCatalogSpec)
    "q_cypher_apoc_help" -> GQuery(
      (s, d) => graft.cypher.Cypher.run(GraphQueries.graph(s, d),
        """CALL apoc.help('coll.') YIELD name WHERE name <> ''
           RETURN count(*) AS n_coll"""),
      Some("SELECT CAST(45 AS BIGINT) AS n_coll"), "2.13"),

    "q_cypher_apoc_help_count" -> GQuery(
      (s, d) => graft.cypher.Cypher.run(GraphQueries.graph(s, d),
        "CALL apoc.help('') YIELD name RETURN count(*) AS n"),
      Some("SELECT CAST(983 AS BIGINT) AS n"), "2.13"),

    // apoc.periodic.iterate: outer read once, inner write applied in
    // row batches (3 batches of ≤2 over the 5 regions)
    "q_cypher_periodic_iterate" -> GQuery(
      (s, d) => {
        val store = new graft.graph.GraphStore(GraphQueries.graph(s, d))
        graft.cypher.CypherWrite.periodicIterate(store,
          "MATCH (r:Region) RETURN r", "SET r.acctbal = 1", 2)
        store.snapshot.nodes.filter(array_contains(col("labels"), "Region"))
          .select(col("key").as("k"), col("acctbal"))
      },
      Some("SELECT r_regionkey AS k, CAST(1.0 AS DOUBLE) AS acctbal FROM region"),
      "2.8"),

    // SHOW PROCEDURES / SHOW FUNCTIONS — the reference's curated catalog
    // tables (executor_show.go:33-161), summarized per family/mode so the
    // oracle pins the counts and catalog boundaries without 105 VALUES
    "q_cypher_show_catalogs" -> GQuery(
      (s, d) => {
        val store = new graft.graph.GraphStore(GraphQueries.graph(s, d),
          registerGlobal = false)
        import graft.cypher.CypherDdl.tryExecute
        val procs = tryExecute(store, "SHOW PROCEDURES").get
        val fns = tryExecute(store, "SHOW FUNCTIONS").get
        procs.groupBy("mode").agg(
            count(lit(1)).as("n"), min("name").as("first_name"),
            max("name").as("last_name"))
          .select(lit("procedures").as("catalog"), col("mode"),
            col("n"), col("first_name"), col("last_name"))
          .unionAll(fns.groupBy(col("aggregating").cast("string").as("mode"))
            .agg(count(lit(1)).as("n"), min("name").as("first_name"),
              max("name").as("last_name"))
            .select(lit("functions").as("catalog"), col("mode"),
              col("n"), col("first_name"), col("last_name")))
      },
      Some("""SELECT * FROM (VALUES
                ('procedures', 'READ', CAST(20 AS BIGINT), 'apoc.path.expand', 'nornicdb.version'),
                ('procedures', 'DBMS', CAST(7 AS BIGINT), 'dbms.clientConfig', 'dbms.procedures'),
                ('functions', 'false', CAST(72 AS BIGINT), 'abs', 'vector.similarity.euclidean'),
                ('functions', 'true', CAST(6 AS BIGINT), 'avg', 'sum'))
              t(catalog, mode, n, first_name, last_name)"""),
      "2.9"),

    // schema DDL lifecycle through the string surface: create three
    // indexes + a constraint, drop one, SHOW the survivors
    "q_cypher_ddl_show" -> GQuery(
      (s, d) => {
        val store = new graft.graph.GraphStore(GraphQueries.graph(s, d))
        import graft.cypher.CypherDdl.tryExecute
        tryExecute(store, "CREATE INDEX cust_name FOR (n:Customer) ON (n.name)")
        tryExecute(store, "CREATE VECTOR INDEX part_vec FOR (n:Part) ON (n.embedding)")
        tryExecute(store, "CREATE FULLTEXT INDEX part_text FOR (n:Part) ON (n.name)")
        tryExecute(store, "CREATE CONSTRAINT cust_key FOR (n:Customer) REQUIRE n.key IS UNIQUE")
        tryExecute(store, "DROP INDEX part_vec")
        tryExecute(store, "SHOW INDEXES").get
      },
      Some("""SELECT * FROM (VALUES
                ('cust_name','RANGE','Customer','name','ONLINE'),
                ('part_text','FULLTEXT','Part','name','ONLINE'))
              t(name, type, label, properties, state)"""), "2.9"),

    // result-serialization round-trip: rows → HTTP tx-API row JSON → rows.
    // Matching the raw-SQL oracle proves the wire shape is lossless.
    "q_sink_http_shape" -> GQuery(
      (s, d) => {
        val res = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        ResultJson.parseRows(ResultJson.rowsJson(res), res.schema)
      },
      Some("SELECT n_nationkey, n_name FROM nation"), "3.2"),

    // Bolt PackStream round-trip: rows → RECORD messages (distributed
    // encode, reference wire grammar) → rows. Lossless ⇔ oracle matches.
    "q_sink_bolt_shape" -> GQuery(
      (s, d) => {
        val res = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        PackStream.parseRecords(PackStream.records(res), res.schema)
      },
      Some("SELECT n_nationkey, n_name FROM nation"), "3.2"),

    // retention sweep classification (pkg/retention/retention.go:773-795):
    // events mapped to compliance categories, a policy per category, one
    // subject-scoped hold + one expired hold; the verdict histogram is
    // replayed with the same CASE cascade in DuckDB.
    "q_retention_classify" -> GQuery(
      (s, d) =>
        Retention
          .classify(RetentionFixture.records(s, d), RetentionFixture.policies,
            RetentionFixture.holds, RetentionFixture.asOf)
          .groupBy("category", "action", "reason")
          .agg(count(lit(1)).as("n")),
      Some(s"""SELECT category, action, reason, count(*) AS n
               FROM (${RetentionFixture.classifySql}) GROUP BY 1, 2, 3"""),
      "2.12"),

    // GDPR Art.17 erasure (retention.go:900-955): erase subject 7's records
    // except categories under the hold; per-category erased/held counts.
    "q_retention_erasure" -> GQuery(
      (s, d) =>
        Retention
          .processErasure(RetentionFixture.records(s, d), "7",
            RetentionFixture.holds, RetentionFixture.asOf)
          .groupBy("category", "erased", "reason")
          .agg(count(lit(1)).as("n")),
      Some(s"""SELECT category,
                 NOT (category IN ('PII', 'USER')) AS erased,
                 CASE WHEN category IN ('PII', 'USER')
                      THEN 'legal hold' ELSE 'erased' END AS reason,
                 count(*) AS n
               FROM (${RetentionFixture.recordsSql})
               WHERE subject_id = '7'
               GROUP BY 1, 2, 3"""),
      "2.12"),

    // GDPR privacy lifecycle (db_privacy.go:38-213, db_admin.go:1239-1439):
    // consent ledger upsert/revoke/read, then anonymize one user's nodes
    // (pseudonymous owner, PII keys stripped, hoisted name nulled) and
    // erase another's. Customers are owner-tagged user<key%50>.
    "q_privacy_lifecycle" -> GQuery(
      (s, d) => {
        import graft.graph.{GraphStore, PropertyGraph}
        import graft.operators.Privacy
        val g = GraphQueries.graph(s, d)
        val isCust = array_contains(col("labels"), "Customer")
        val tagged = g.nodes.withColumn("properties",
          when(isCust, map_concat(col("properties"),
            map(lit("owner_id"), concat(lit("user"), col("key") % 50),
              lit("email"), concat(col("name"), lit("@example.com")))))
            .otherwise(col("properties")))
        val store = new GraphStore(PropertyGraph(tagged, g.edges))
        Privacy.recordConsent(store, "user7", "training", given = true)
        Privacy.recordConsent(store, "user7", "marketing", given = true)
        Privacy.revokeConsent(store, "user7", "marketing")
        val hasTraining = Privacy.hasConsent(store, "user7", "training")
        val hasMarketing = Privacy.hasConsent(store, "user7", "marketing")
        val hasUnknown = Privacy.hasConsent(store, "user9", "training")
        val nConsents = Privacy.userConsents(store, "user7").count()
        val ownedBefore = Privacy.exportUserData(store, "user7").count()
        Privacy.anonymizeUserData(store, "user7")
        val ownedAfter = Privacy.exportUserData(store, "user7").count()
        val anon = store.snapshot.nodes.filter(
          element_at(col("properties"), "owner_id") === Privacy.anonymousId("user7") &&
            col("name").isNull &&
            !map_contains_key(col("properties"), "email")).count()
        val deleted = Privacy.deleteUserData(store, "user9")
        val custAfter = store.snapshot.nodes.filter(isCust).count()
        import s.implicits._
        Seq((if (hasTraining) 1 else 0, if (hasMarketing) 1 else 0,
          if (hasUnknown) 1 else 0, nConsents, ownedBefore, ownedAfter,
          anon, deleted, custAfter))
          .toDF("has_training", "has_marketing", "has_unknown", "n_consents",
            "owned_before", "owned_after", "anonymized", "deleted", "cust_after")
      },
      Some("""SELECT 1 AS has_training, 0 AS has_marketing, 0 AS has_unknown,
                CAST(2 AS BIGINT) AS n_consents,
                (SELECT COUNT(*) FROM customer WHERE c_custkey % 50 = 7)
                  AS owned_before,
                CAST(0 AS BIGINT) AS owned_after,
                (SELECT COUNT(*) FROM customer WHERE c_custkey % 50 = 7)
                  AS anonymized,
                (SELECT COUNT(*) FROM customer WHERE c_custkey % 50 = 9)
                  AS deleted,
                (SELECT COUNT(*) FROM customer)
                  - (SELECT COUNT(*) FROM customer WHERE c_custkey % 50 = 9)
                  AS cust_after"""), "2.12"),

    // compliance report over the audit trail (pkg/audit/audit.go:1036-1080):
    // one aggregation row; DataAccesses excludes EXPORT, erasures count
    // request+complete, unique users ignore empty ids.
    "q_audit_compliance_report" -> GQuery(
      (s, d) =>
        Audit.complianceReport(AuditFixture.log(s, d),
          "2024-01-05 00:00:00", "2024-01-20 00:00:00", "jan-window"),
      Some(s"""SELECT count(*) AS total_events,
                 CAST(SUM(CASE WHEN event_type = 'LOGIN_FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed_logins,
                 CAST(SUM(CASE WHEN event_type = 'ACCESS_DENIED' THEN 1 ELSE 0 END) AS BIGINT) AS access_denied,
                 CAST(SUM(CASE WHEN event_type IN ('DATA_READ', 'DATA_CREATE', 'DATA_UPDATE', 'DATA_DELETE') THEN 1 ELSE 0 END) AS BIGINT) AS data_accesses,
                 CAST(SUM(CASE WHEN event_type IN ('ERASURE_REQUEST', 'ERASURE_COMPLETE') THEN 1 ELSE 0 END) AS BIGINT) AS erasure_requests,
                 CAST(SUM(CASE WHEN event_type IN ('SECURITY_ALERT', 'BREACH_DETECTED') THEN 1 ELSE 0 END) AS BIGINT) AS security_alerts,
                 COUNT(DISTINCT CASE WHEN user_id <> '' THEN user_id END) AS unique_users,
                 'jan-window' AS period
               FROM (${AuditFixture.logSql})
               WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
                 AND ts <= TIMESTAMP '2024-01-20 00:00:00'"""),
      "2.12"),

    // Reader.Query filter bundle + pagination (audit.go:860-925): user 7's
    // successful data accesses, ordered, OFFSET 10 LIMIT 50 — the page is
    // replayed exactly in DuckDB.
    "q_audit_user_activity" -> GQuery(
      (s, d) =>
        Audit.query(AuditFixture.log(s, d),
            start = Some("2024-01-01 00:00:00"), end = Some("2024-01-31 00:00:00"),
            eventTypes = Audit.dataAccessTypes, userId = Some("7"),
            success = Some(true))
          .select("event_id", "ts", "event_type", "resource_id")
          .orderBy("ts", "event_id").offset(10).limit(50),
      Some(s"""SELECT event_id, ts, event_type, resource_id
               FROM (${AuditFixture.logSql})
               WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
                 AND ts <= TIMESTAMP '2024-01-31 00:00:00'
                 AND event_type IN ('DATA_READ', 'DATA_CREATE', 'DATA_UPDATE', 'DATA_DELETE', 'DATA_EXPORT')
                 AND user_id = '7' AND success
               ORDER BY ts, event_id OFFSET 10 LIMIT 50"""),
      "2.12"))
}

/** Deterministic audit-trail derivation from `events` shared by the Spark
  * rows and the DuckDB replays: event types fan out by id parity with small
  * erasure/security strata, resource = id mod 50, auth failures are the
  * unsuccessful rows.
  */
object AuditFixture {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def log(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      col("ts"),
      col("user_id").cast("string").as("user_id"),
      when(col("event_type") === "purchase" && col("event_id") % 13 === 0, "ERASURE_REQUEST")
        .when(col("event_type") === "click" && col("event_id") % 17 === 0, "SECURITY_ALERT")
        .when(col("event_type") === "signup",
          when(col("event_id") % 2 === 0, "LOGIN").otherwise("CONSENT_GIVEN"))
        .when(col("event_type") === "error",
          when(col("event_id") % 2 === 0, "LOGIN_FAILED").otherwise("ACCESS_DENIED"))
        .when(col("event_type") === "purchase",
          when(col("event_id") % 2 === 0, "DATA_CREATE").otherwise("DATA_UPDATE"))
        .when(col("event_type") === "view",
          when(col("event_id") % 2 === 0, "DATA_EXPORT").otherwise("DATA_READ"))
        .otherwise("DATA_READ").as("event_type"),
      concat(lit("res-"), col("event_id") % 50).as("resource_id"))
      .withColumn("success",
        !col("event_type").isin("LOGIN_FAILED", "ACCESS_DENIED", "BREACH_DETECTED"))

  val logSql: String =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(user_id AS VARCHAR) AS user_id,
         CASE
           WHEN event_type = 'purchase' AND event_id % 13 = 0 THEN 'ERASURE_REQUEST'
           WHEN event_type = 'click' AND event_id % 17 = 0 THEN 'SECURITY_ALERT'
           WHEN event_type = 'signup' THEN
             CASE WHEN event_id % 2 = 0 THEN 'LOGIN' ELSE 'CONSENT_GIVEN' END
           WHEN event_type = 'error' THEN
             CASE WHEN event_id % 2 = 0 THEN 'LOGIN_FAILED' ELSE 'ACCESS_DENIED' END
           WHEN event_type = 'purchase' THEN
             CASE WHEN event_id % 2 = 0 THEN 'DATA_CREATE' ELSE 'DATA_UPDATE' END
           WHEN event_type = 'view' THEN
             CASE WHEN event_id % 2 = 0 THEN 'DATA_EXPORT' ELSE 'DATA_READ' END
           ELSE 'DATA_READ' END AS event_type,
         'res-' || (event_id % 50) AS resource_id,
         CASE
           WHEN event_type = 'purchase' AND event_id % 13 = 0 THEN true
           WHEN event_type = 'click' AND event_id % 17 = 0 THEN true
           WHEN event_type = 'error' THEN false
           ELSE true END AS success
       FROM events"""
}

/** Deterministic retention scenario over `events` shared by the Spark rows
  * and their DuckDB replays. Categories derive from event_type; the sweep
  * instant is fixed mid-range so each reason bucket is populated.
  */
object RetentionFixture {
  import graft.operators.Retention

  val asOf = "2024-01-25 00:00:00"

  /** signup→PII, purchase→FINANCIAL, click→ANALYTICS, view→USER,
    * error→SYSTEM. */
  def records(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(
      col("event_id").as("record_id"),
      col("user_id").cast("string").as("subject_id"),
      when(col("event_type") === "signup", "PII")
        .when(col("event_type") === "purchase", "FINANCIAL")
        .when(col("event_type") === "click", "ANALYTICS")
        .when(col("event_type") === "view", "USER")
        .otherwise("SYSTEM").as("category"),
      col("ts").as("created_at"))

  val policies = Seq(
    Retention.Policy("analytics-7d", "Analytics", "ANALYTICS", Some(168L)),
    Retention.Policy("user-14d", "User Data", "USER", Some(336L)),
    Retention.Policy("pii-20d", "PII", "PII", Some(480L)),
    Retention.Policy("fin-10d", "Financial", "FINANCIAL", Some(240L), archiveBeforeDelete = true),
    Retention.Policy("sys-1d", "System", "SYSTEM", Some(24L), active = false))

  val holds = Seq(
    Retention.LegalHold("hold-matter-1", Seq("7", "11", "13"), Seq("PII", "USER")),
    Retention.LegalHold("hold-expired", Nil, Seq("ANALYTICS"),
      expiresAt = Some("2024-01-05 00:00:00")))

  val recordsSql: String =
    """SELECT event_id AS record_id, CAST(user_id AS VARCHAR) AS subject_id,
         CASE event_type WHEN 'signup' THEN 'PII' WHEN 'purchase' THEN 'FINANCIAL'
              WHEN 'click' THEN 'ANALYTICS' WHEN 'view' THEN 'USER'
              ELSE 'SYSTEM' END AS category,
         CAST(ts AS TIMESTAMP) AS created_at
       FROM events"""

  /** The ShouldDelete cascade over [[recordsSql]]: hold-matter-1 is the only
    * hold active at asOf (hold-expired lapsed 2024-01-05); SYSTEM's policy
    * is inactive; expiry is the strict `asOf > created_at + hours`. */
  val classifySql: String =
    s"""SELECT category,
          CASE WHEN reason = 'retention period expired'
               THEN (CASE WHEN category = 'FINANCIAL'
                          THEN 'ARCHIVE_DELETE' ELSE 'DELETE' END)
               ELSE 'RETAIN' END AS action,
          reason
        FROM (
          SELECT category,
            CASE
              WHEN subject_id IN ('7', '11', '13')
                   AND category IN ('PII', 'USER') THEN 'under legal hold'
              WHEN category = 'SYSTEM' THEN 'policy inactive'
              WHEN category = 'ANALYTICS'
                   AND TIMESTAMP '$asOf' > created_at + INTERVAL 168 HOUR
                THEN 'retention period expired'
              WHEN category = 'USER'
                   AND TIMESTAMP '$asOf' > created_at + INTERVAL 336 HOUR
                THEN 'retention period expired'
              WHEN category = 'PII'
                   AND TIMESTAMP '$asOf' > created_at + INTERVAL 480 HOUR
                THEN 'retention period expired'
              WHEN category = 'FINANCIAL'
                   AND TIMESTAMP '$asOf' > created_at + INTERVAL 240 HOUR
                THEN 'retention period expired'
              ELSE 'within retention period' END AS reason
          FROM (${recordsSql}))"""
}
