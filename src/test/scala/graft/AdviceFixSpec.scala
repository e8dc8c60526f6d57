package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Regression tests for the round-1 advisor findings: XOR truth table,
  * correlated CALL {} join semantics (zero-match drop vs count()=0, scalar
  * imports), `[*0..n]` zero-hop expansion, sum/avg(DISTINCT), multi-label
  * `(:A:B)` patterns, and rel-type alternation `[:T1|T2]`.
  */
class AdviceFixSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val empty = {
      val g = GraphQueries.graph(spark, sf)
      PropertyGraph(g.nodes.filter("false").localCheckpoint(true),
        g.edges.filter("false").localCheckpoint(true))
    }
    val s = new GraphStore(empty)
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'Alice', acctbal: 30}),
              (b:Person {key: 2, name: 'Bob', acctbal: 25}),
              (c:Person:Admin {key: 3, name: 'Charlie', acctbal: 35}),
              (d:Person {key: 4, name: 'Diana', acctbal: 28})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS {weight: 1}]->(b)")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (c:Person {key: 3}) CREATE (a)-[:KNOWS {weight: 2}]->(c)")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (d:Person {key: 4}) CREATE (a)-[:LIKES {weight: 3}]->(d)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  test("XOR truth table (was silently aliased to OR)") {
    assert(rows("RETURN (1=1) XOR (1=1) AS a, (1=1) XOR (1=0) AS b, (1=0) XOR (1=0) AS c")
      == Seq(Seq(false, true, false)))
  }

  test("XOR is null-propagating") {
    assert(rows("RETURN (null > 1) XOR (1=1) AS a") == Seq(Seq(null)))
  }

  test("XOR binds tighter than OR, looser than AND") {
    // a OR b XOR c parses as a OR (b XOR c); TRUE OR (TRUE XOR TRUE) = TRUE
    assert(rows("RETURN (1=1) OR (1=1) XOR (1=1) AS a") == Seq(Seq(true)))
    // a XOR b AND c parses as a XOR (b AND c); TRUE XOR (TRUE AND FALSE) = TRUE
    assert(rows("RETURN (1=1) XOR (1=1) AND (1=0) AS a") == Seq(Seq(true)))
  }

  test("correlated CALL {} with count() keeps zero-match rows at 0") {
    assert(rows(
      """MATCH (p:Person)
         CALL { WITH p MATCH (p)-[:KNOWS]->(q) RETURN count(q) AS friends }
         RETURN p.name AS nm, friends ORDER BY nm""")
      == Seq(Seq("Alice", 2L), Seq("Bob", 0L), Seq("Charlie", 0L), Seq("Diana", 0L)))
  }

  test("correlated CALL {} non-aggregate drops zero-match rows") {
    assert(rows(
      """MATCH (p:Person)
         CALL { WITH p MATCH (p)-[:KNOWS]->(q) RETURN q.name AS friend }
         RETURN p.name AS nm, friend ORDER BY friend""")
      == Seq(Seq("Alice", "Bob"), Seq("Alice", "Charlie")))
  }

  test("correlated CALL {} importing a scalar (ValK) variable") {
    assert(rows(
      """MATCH (p:Person) WITH p.name AS nm
         CALL { WITH nm RETURN size(nm) AS ln }
         RETURN nm, ln ORDER BY nm""")
      == Seq(Seq("Alice", 5), Seq("Bob", 3), Seq("Charlie", 7), Seq("Diana", 5)))
  }

  test("[*0..1] includes the zero-hop start node") {
    assert(rows(
      "MATCH (a:Person {key: 1})-[:KNOWS*0..1]->(b) RETURN b.name AS nm ORDER BY nm")
      == Seq(Seq("Alice"), Seq("Bob"), Seq("Charlie")))
  }

  test("[*0..0] is exactly the start node") {
    assert(rows(
      "MATCH (a:Person {key: 2})-[:KNOWS*0..0]->(b) RETURN b.name AS nm")
      == Seq(Seq("Bob")))
  }

  test("sum(DISTINCT) and avg(DISTINCT) deduplicate (were silently non-distinct)") {
    assert(rows("UNWIND [1, 1, 2] AS x RETURN sum(DISTINCT x) AS s, sum(x) AS t")
      == Seq(Seq(3L, 4L)))
    assert(rows("UNWIND [1, 1, 2] AS x RETURN avg(DISTINCT x) AS av")
      == Seq(Seq(1.5)))
  }

  test("multi-label (:A:B) requires all labels") {
    assert(rows("MATCH (p:Person:Admin) RETURN p.name AS nm") == Seq(Seq("Charlie")))
    assert(rows("MATCH (p:Person:Ghost) RETURN count(*) AS n") == Seq(Seq(0L)))
    // anchor re-filter path: bound var re-matched with extra label
    assert(rows(
      "MATCH (p:Person) WITH p MATCH (p:Admin) RETURN p.name AS nm")
      == Seq(Seq("Charlie")))
  }

  test("rel-type alternation [:T1|T2] matches either type") {
    assert(rows(
      "MATCH (a:Person {key: 1})-[:KNOWS|LIKES]->(b) RETURN b.name AS nm ORDER BY nm")
      == Seq(Seq("Bob"), Seq("Charlie"), Seq("Diana")))
    assert(rows(
      "MATCH (a:Person {key: 1})-[:KNOWS|LIKES*1..1]->(b) RETURN b.name AS nm ORDER BY nm")
      == Seq(Seq("Bob"), Seq("Charlie"), Seq("Diana")))
  }

  // ---- round-5 advisor findings ----

  test("distance(n, n) is 0 even when the node has no edges of the rel type") {
    // apoc/paths/paths.go:359 — self-distance is 0; the node is absent
    // from the GraphX dictionary for this rel-type set and used to fall
    // through to the unreachable (-1) branch
    val g = GraphQueries.graph(spark, sf)
    assert(graft.algos.BfsRdd.pointDistance(g, "Customer:1", "Customer:1",
      Seq("NO_SUCH_TYPE"), 5, graft.graph.Expand.Both) == 0)
    assert(graft.algos.BfsRdd.pointDistance(g, "Customer:1", "Customer:1",
      Seq("PLACED"), 5, graft.graph.Expand.Both) == 0)
  }

  test("MERGE node ON SET must target the MERGE variable") {
    val g0 = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g0.nodes.filter("false"), g0.edges.filter("false")))
    val ex = intercept[IllegalArgumentException] {
      CypherWrite.execute(s, "MERGE (n:T {key: 1}) ON CREATE SET m.x = 1")
    }
    assert(ex.getMessage.contains("MERGE variable"))
  }

  test("nodes(p) on a bulk-anchored var-length pattern fails fast with a clear error") {
    // bulk anchors bind p with only length(p); nodes()/relationships()
    // must say so instead of throwing an opaque analysis error
    val ex = intercept[IllegalArgumentException] {
      Cypher.run(GraphQueries.graph(spark, sf),
        "MATCH p = (c:Customer)-[:PLACED*1..1]->(o:Order) RETURN nodes(p) AS ns")
        .collect()
    }
    assert(ex.getMessage.contains("point-anchored"))
  }
}
