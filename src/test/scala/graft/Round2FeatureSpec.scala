package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{Expand, GraphStore, PropertyGraph}

/** Round-2 feature coverage: COUNT {} / COLLECT {} / EXISTS {} expression
  * subqueries, dynamic (non-hoisted) property fallback through the string
  * map, relationship-pattern MERGE, and allShortestPaths enumeration.
  */
class Round2FeatureSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val empty = {
      val g = GraphQueries.graph(spark, sf)
      PropertyGraph(g.nodes.filter("false").localCheckpoint(true),
        g.edges.filter("false").localCheckpoint(true))
    }
    val s = new GraphStore(empty)
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'Alice'}), (b:Person {key: 2, name: 'Bob'}),
              (c:Person {key: 3, name: 'Cara'}), (d:Person {key: 4, name: 'Dan'})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS]->(b)")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (c:Person {key: 3}) CREATE (a)-[:KNOWS]->(c)")
    CypherWrite.execute(s,
      "MATCH (b:Person {key: 2}) MATCH (d:Person {key: 4}) CREATE (b)-[:KNOWS]->(d)")
    CypherWrite.execute(s,
      "MATCH (c:Person {key: 3}) MATCH (d:Person {key: 4}) CREATE (c)-[:KNOWS]->(d)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  test("COUNT {} in RETURN yields 0 for zero-match rows") {
    assert(rows(
      """MATCH (p:Person)
         RETURN p.name AS nm, COUNT { (p)-[:KNOWS]->(q) } AS friends ORDER BY nm""")
      == Seq(Seq("Alice", 2L), Seq("Bob", 1L), Seq("Cara", 1L), Seq("Dan", 0L)))
  }

  test("COUNT {} with inner WHERE as a filter predicate") {
    assert(rows(
      """MATCH (p:Person)
         WHERE COUNT { (p)-[:KNOWS]->(q:Person) WHERE q.key > 2 } >= 1
         RETURN p.name AS nm ORDER BY nm""")
      == Seq(Seq("Alice"), Seq("Bob"), Seq("Cara")))
  }

  test("COLLECT {} returns a sorted array, empty for zero matches") {
    assert(rows(
      """MATCH (p:Person)
         RETURN p.name AS nm,
                apoc.text.join(COLLECT { MATCH (p)-[:KNOWS]->(q) RETURN q.name }, ',') AS fr
         ORDER BY nm""")
      == Seq(Seq("Alice", "Bob,Cara"), Seq("Bob", "Dan"), Seq("Cara", "Dan"), Seq("Dan", "")))
  }

  test("EXISTS {} block form with inner WHERE") {
    assert(rows(
      """MATCH (p:Person)
         WHERE EXISTS { (p)-[:KNOWS]->(q:Person) WHERE q.key = 4 }
         RETURN p.name AS nm ORDER BY nm""")
      == Seq(Seq("Bob"), Seq("Cara")))
  }

  test("dynamic non-hoisted property falls back to the string map") {
    val g = GraphQueries.graph(spark, sf)
    val out = Cypher.run(g,
      "MATCH (o:Order) WHERE o.orderstatus = 'F' RETURN count(*) AS n")
      .collect().head.getLong(0)
    val expected = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(out == expected && expected > 0)
  }

  test("relationship MERGE is idempotent and creates only missing edges") {
    val before = store.snapshot.edges.count()
    // existing edge → no-op
    val r1 = CypherWrite.execute(store,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) MERGE (a)-[:KNOWS]->(b)")
    assert(r1.relationshipsCreated == 0)
    assert(store.snapshot.edges.count() == before)
    // new edge → created once, second MERGE is a no-op
    val r2 = CypherWrite.execute(store,
      "MATCH (a:Person {key: 1}) MATCH (d:Person {key: 4}) MERGE (a)-[:LIKES]->(d)")
    assert(r2.relationshipsCreated == 1)
    val r3 = CypherWrite.execute(store,
      "MATCH (a:Person {key: 1}) MATCH (d:Person {key: 4}) MERGE (a)-[:LIKES]->(d)")
    assert(r3.relationshipsCreated == 0)
    assert(store.snapshot.edges.count() == before + 1)
  }

  test("relationship MERGE ON CREATE SET / ON MATCH SET") {
    CypherWrite.execute(store,
      """MATCH (b:Person {key: 2}) MATCH (c:Person {key: 3})
         MERGE (b)-[r:RATED]->(c) ON CREATE SET r.weight = 7""")
    val w1 = store.snapshot.edges.filter(col("rel_type") === "RATED")
      .collect().map(_.getAs[Double]("weight")).toSeq
    assert(w1 == Seq(7.0))
    CypherWrite.execute(store,
      """MATCH (b:Person {key: 2}) MATCH (c:Person {key: 3})
         MERGE (b)-[r:RATED]->(c) ON CREATE SET r.weight = 1 ON MATCH SET r.weight = 9""")
    val w2 = store.snapshot.edges.filter(col("rel_type") === "RATED")
      .collect().map(_.getAs[Double]("weight")).toSeq
    assert(w2 == Seq(9.0)) // matched, not re-created
  }

  test("CALL apoc.cypher.run invokes the engine recursively") {
    val g = GraphQueries.graph(spark, sf)
    val out = Cypher.run(g,
      """CALL apoc.cypher.run('MATCH (r:Region) RETURN r.name AS nm') YIELD nm
         RETURN count(*) AS n""")
      .collect().head.getLong(0)
    assert(out == 5L)
  }

  test("allShortestPaths enumerates every distinct shortest path") {
    // Alice→Dan: two 2-hop paths (via Bob, via Cara); the direct LIKES edge
    // from the MERGE test above would shorten it, so restrict to KNOWS
    val paths = Expand.allShortestPaths(store.snapshot,
        "Person:1", "Person:4", Some("KNOWS"), 5)
      .select(array_join(col("path"), ">").as("p"), col("length"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(paths == Set(
      ("Person:1>Person:2>Person:4", 2),
      ("Person:1>Person:3>Person:4", 2)))
  }

  test("CALL proc() YIELD with aliasing and WHERE through the string surface") {
    val g = GraphQueries.graph(spark, sf)
    val out = Cypher.run(g,
      """CALL db.labels() YIELD label AS l, n_nodes WHERE n_nodes > 0
         RETURN l ORDER BY l""")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Customer", "Nation", "Order", "Part", "Region", "Supplier"))
  }

  test("shortestPath() Cypher surface binds endpoints and the path struct") {
    val g = GraphQueries.graph(spark, sf)
    val rows = Cypher.run(g,
      """MATCH p = shortestPath((c:Customer {key: 1})-[*..4]->(r:Region))
         RETURN c.key AS ck, r.name AS region, length(p) AS len,
                apoc.text.join(nodes(p), '>') AS path""")
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("ck") == 1L && r.getAs[Int]("len") == 2)
    assert(r.getAs[String]("path").startsWith("Customer:1>Nation:"))
  }

  test("correlated CALL {} with per-group ORDER BY and LIMIT") {
    assert(rows(
      """MATCH (p:Person)
         CALL { WITH p MATCH (p)-[:KNOWS]->(q)
                RETURN q.name AS friend ORDER BY friend ASC LIMIT 1 }
         RETURN p.name AS nm, friend ORDER BY nm""")
      == Seq(Seq("Alice", "Bob"), Seq("Bob", "Dan"), Seq("Cara", "Dan")))
  }

  test("COLLECT {} with ORDER BY on a non-returned expression") {
    assert(rows(
      """MATCH (p:Person {key: 1})
         RETURN apoc.text.join(COLLECT {
           MATCH (p)-[:KNOWS]->(q) RETURN q.name ORDER BY q.key DESC }, ',') AS fr""")
      == Seq(Seq("Cara,Bob"))) // key 3 before key 2
  }

  test("shortestPath over rel-type alternation traverses BOTH types") {
    // isolated store: the ONLY 1→4 route is KNOWS then LIKES, so a working
    // alternation must return exactly that mixed 2-hop path (a KNOWS-only
    // traversal finds nothing; suite order can't perturb this fixture)
    val iso = {
      val g = GraphQueries.graph(spark, sf)
      val s = new GraphStore(PropertyGraph(
        g.nodes.filter("false").localCheckpoint(true),
        g.edges.filter("false").localCheckpoint(true)))
      CypherWrite.execute(s,
        """CREATE (a:Person {key: 1, name: 'A'}), (b:Person {key: 2, name: 'B'}),
                (c:Person {key: 4, name: 'C'})""")
      CypherWrite.execute(s,
        "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS]->(b)")
      CypherWrite.execute(s,
        "MATCH (b:Person {key: 2}) MATCH (c:Person {key: 4}) CREATE (b)-[:LIKES]->(c)")
      s
    }
    val paths = Expand.allShortestPathsMulti(iso.snapshot,
        iso.snapshot.nodes.filter(col("id") === "Person:1").select("id"),
        iso.snapshot.nodes.filter(col("id") === "Person:4").select("id"),
        Some("KNOWS"), 5, Expand.Out, Seq("LIKES"))
      .collect()
    assert(paths.length == 1)
    assert(paths.head.getAs[Int]("length") == 2)
    assert(paths.head.getSeq[String](paths.head.fieldIndex("path")).toSeq ==
      Seq("Person:1", "Person:2", "Person:4"))
  }

  test("PROFILE reports actual output rows per physical operator") {
    val g = GraphQueries.graph(spark, sf)
    val prof = graft.cypher.ProfileCypher.profile(g,
      "MATCH (r:Region) RETURN r.name AS nm").collect()
    assert(prof.nonEmpty)
    // some operator actually emitted the 5 region rows
    assert(prof.exists(r => r.getLong(1) == 5L),
      prof.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }

  test("USE <db> routes to the named graph in the catalog") {
    val tpch = GraphQueries.graph(spark, sf)
    val catalog = Map("people" -> store.snapshot, "tpch" -> tpch)
    val n1 = Cypher.runMulti(catalog, tpch,
      "USE people MATCH (p:Person) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n1 == 4L)
    val n2 = Cypher.runMulti(catalog, tpch,
      "MATCH (r:Region) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n2 == 5L)
    intercept[IllegalArgumentException] {
      Cypher.runMulti(catalog, tpch, "USE nope MATCH (n) RETURN n")
    }
  }

  test("USING INDEX hints are accepted and surfaced in EXPLAIN") {
    val g = GraphQueries.graph(spark, sf)
    val n = Cypher.run(g,
      """MATCH (c:Customer) USING INDEX c:Customer(key)
         WHERE c.key = 1 RETURN c.name AS nm""").count()
    assert(n == 1)
    val ops = graft.cypher.ExplainCypher.operators(
      "MATCH (c:Customer) USING INDEX c:Customer(key) WHERE c.key = 1 RETURN c")
    assert(ops.contains("Hint(INDEX c:Customer(key))"))
  }

  test("gds.graph.project / list / drop lifecycle") {
    val g = GraphQueries.graph(spark, sf)
    val row = Cypher.run(g,
      """CALL gds.graph.project('r2spec', 'Nation', 'IN')
         YIELD graphName, nodeCount, relationshipCount
         RETURN graphName, nodeCount, relationshipCount""").collect().head
    assert(row.getString(0) == "r2spec" && row.getLong(1) == 25L && row.getLong(2) == 25L)
    assert(Cypher.run(g, "CALL gds.graph.list() YIELD graphName WHERE graphName = 'r2spec' RETURN graphName")
      .count() == 1)
    assert(Cypher.run(g, "CALL gds.graph.drop('r2spec') YIELD dropped RETURN dropped")
      .collect().head.getBoolean(0))
  }

  test("allShortestPaths returns empty for unreachable endpoints") {
    val n = Expand.allShortestPaths(store.snapshot,
      "Person:4", "Person:1", Some("KNOWS"), 5).count() // edges point away
    assert(n == 0)
  }
}
