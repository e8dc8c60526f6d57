package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherDdl}
import graft.graph.GraphStore

/** The CALL dispatcher's compat tail (`pkg/cypher/call.go:676-805`,
  * `call_compat.go`, `call_index_mgmt.go`): every procedure executes
  * through the real Cypher CALL path with the reference's column shapes.
  */
class CompatProcsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val g = GraphQueries.graph(spark, sf)

  private def call(q: String) = Cypher.run(g, q).collect()

  test("db.indexes / db.constraints list DDL-created schema objects") {
    val store = new GraphStore(g)
    CypherDdl.tryExecute(store, "CREATE INDEX seg_idx FOR (n:Customer) ON (n.mktsegment)")
    CypherDdl.tryExecute(store,
      "CREATE CONSTRAINT cust_key FOR (n:Customer) REQUIRE n.key IS UNIQUE")
    val idx = call("CALL db.indexes() YIELD name, type, state RETURN name, type, state")
    assert(idx.exists(r => r.getString(0) == "seg_idx" && r.getString(2) == "ONLINE"))
    val cons = call("CALL db.constraints() YIELD name, type RETURN name, type")
    assert(cons.exists(r => r.getString(0) == "cust_key" && r.getString(1) == "UNIQUE"))
  }

  test("db.index.stats computes selectivity = unique/total") {
    val store = new GraphStore(g)
    CypherDdl.tryExecute(store, "CREATE INDEX nm_idx FOR (n:Nation) ON (n.name)")
    val r = call("""CALL db.index.stats()
                    YIELD name, totalEntries, uniqueValues, selectivity
                    RETURN name, totalEntries, uniqueValues, selectivity""").head
    assert(r.getAs[Long]("totalEntries") === 25L) // 25 nations, all distinct names
    assert(r.getAs[Long]("uniqueValues") === 25L)
    assert(r.getAs[Double]("selectivity") === 1.0)
  }

  test("index management no-op acks return the reference's status strings") {
    assert(call("CALL db.awaitIndex('x', 300) YIELD status RETURN status")
      .head.getString(0) === "Index is online")
    assert(call("CALL db.awaitIndexes(300) YIELD status RETURN status")
      .head.getString(0) === "All indexes are online")
    assert(call("CALL db.resampleIndex('x') YIELD status RETURN status")
      .head.getString(0) === "Index statistics updated")
    assert(call("CALL db.clearQueryCaches() YIELD status RETURN status")
      .head.getString(0) === "Query caches cleared")
  }

  test("db.stats family: collect/retrieve/status/stop/clear/retrieveAllAnTheStats") {
    assert(call("CALL db.stats.collect('QUERIES') YIELD success RETURN success")
      .head.getBoolean(0))
    assert(call("CALL db.stats.retrieve('QUERIES') YIELD data RETURN data")
      .head.getString(0).contains("totalQueries"))
    assert(call("CALL db.stats.status() YIELD status RETURN status")
      .head.getString(0) === "idle")
    assert(call("CALL db.stats.stop() YIELD success RETURN success")
      .head.getBoolean(0))
    assert(call("CALL db.stats.clear() YIELD data RETURN data")
      .head.getString(0).contains("cleared"))
    val all = call("CALL db.stats.retrieveAllAnTheStats() YIELD section, data RETURN section, data")
    assert(all.map(_.getString(0)).toSet === Set("GRAPH COUNTS", "QUERIES"))
    val counts = all.find(_.getString(0) == "GRAPH COUNTS").get.getString(1)
    assert(counts.contains("\"nodeCount\": " + g.nodes.count()))
  }

  test("dbms.* info surface has the reference shapes") {
    assert(call("CALL dbms.info() YIELD name RETURN name").head.getString(0) === "graft")
    assert(call("CALL dbms.listConfig() YIELD name RETURN name").length === 3)
    assert(call("CALL dbms.clientConfig() YIELD name, value RETURN name, value").length === 2)
    assert(call("CALL dbms.listConnections() YIELD connectionId RETURN connectionId").isEmpty)
    val procs = call("CALL dbms.procedures() YIELD name, mode RETURN name, mode")
    assert(procs.length > 100) // the live registry, not a starter table
    assert(procs.exists(_.getString(0) == "db.labels"))
    assert(procs.find(_.getString(0) == "dbms.functions").get.getString(1) === "DBMS")
    val fns = call("CALL dbms.functions() YIELD name, category RETURN name, category")
    assert(fns.length === 22)
    assert(fns.exists(r => r.getString(0) == "collect" && r.getString(1) == "Aggregating"))
  }

  test("nornicdb.* extension procedures") {
    assert(call("CALL nornicdb.version() YIELD version, edition RETURN version, edition")
      .head.getString(1) === "community")
    val st = call("""CALL nornicdb.stats()
                     YIELD nodes, relationships, labels, relationshipTypes
                     RETURN nodes, relationships, labels, relationshipTypes""").head
    assert(st.getAs[Long]("nodes") === g.nodes.count())
    assert(st.getAs[Long]("labels") === 6L)
    val decay = call("""CALL nornicdb.decay.info()
                        YIELD enabled, halfLifeEpisodic, archiveThreshold
                        RETURN enabled, halfLifeEpisodic, archiveThreshold""").head
    assert(decay.getBoolean(0))
    assert(decay.getString(1) === "7 days")
  }

  test("dotted load/export aliases round-trip through the CALL surface") {
    val dir = java.nio.file.Files.createTempDirectory("compat_export").toString
    val out = call(s"CALL apoc.export.csv.all('$dir/all.csv') YIELD rows RETURN rows")
    assert(out.head.getLong(0) === g.nodes.count())
    assert(call(s"CALL apoc.load.csv('$dir/all.csv') YIELD id RETURN count(*) AS n")
      .head.getLong(0) === g.nodes.count())
    val q = call(
      s"CALL apoc.export.csv.query('MATCH (r:Region) RETURN r.name', '$dir/q.csv') " +
        "YIELD rows RETURN rows")
    assert(q.head.getLong(0) === 5L)
  }

  test("apoc.neighbors.byhop counts first-reach frontiers per hop") {
    val rows = call(
      """CALL apoc.neighbors.byhop('Region:0', '', 2) YIELD hop, n_nodes
         RETURN hop, n_nodes""")
    // Region has no outgoing edges in the TPC-H graph → empty frontier
    assert(rows.isEmpty)
    val nation = call(
      """CALL apoc.neighbors.byhop('Nation:0', 'IN', 2) YIELD hop, n_nodes
         RETURN hop, n_nodes""")
    assert(nation.length === 1) // Nation -IN-> Region, one hop, one node
    assert(nation.head.getLong(1) === 1L)
  }

  test("apoc.algo.wcc yields one componentId per node, label-scopable") {
    val scoped = call(
      "CALL apoc.algo.wcc('Region') YIELD node, componentId RETURN node, componentId")
    assert(scoped.length === 5) // all regions, each a component via IN edges
    assert(scoped.map(_.getString(0)).toSet.size === 5)
  }

  test("tx.setMetaData requires an active transaction and stores the map") {
    val store = new GraphStore(g)
    val ex = intercept[Exception] {
      Cypher.run(g, "CALL tx.setMetaData({app: 'test'}) YIELD status RETURN status")
        .collect()
    }
    assert(ex.getMessage.contains("active transaction"))
    store.transaction { tx =>
      val r = Cypher.run(g,
        "CALL tx.setMetaData({app: 'graft-spec', run: 7}) YIELD status RETURN status")
        .collect()
      assert(r.head.getString(0).contains("successfully"))
      assert(tx.txMetadata("app") === "graft-spec")
    }
  }
}
