package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** The reference's Person/Company E2E fixture
  * (`/root/reference/pkg/cypher/e2e_query_test.go:28-44`: Alice 30 NYC,
  * Bob 25 LA, Charlie 35 NYC, Diana 28 SF + KNOWS edges), built through
  * the Cypher WRITE surface and queried through the READ surface — the
  * whole engine loop with literal expected rows, reference test style.
  * Hoisted-property mapping: age → acctbal, city → mktsegment.
  */
class E2eFixtureSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val empty = {
      val g = GraphQueries.graph(spark, sf)
      PropertyGraph(g.nodes.filter("false").localCheckpoint(true),
        g.edges.filter("false").localCheckpoint(true))
    }
    val s = new GraphStore(empty)
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'Alice', acctbal: 30, mktsegment: 'NYC'}),
                (b:Person {key: 2, name: 'Bob', acctbal: 25, mktsegment: 'LA'}),
                (c:Person {key: 3, name: 'Charlie', acctbal: 35, mktsegment: 'NYC'}),
                (d:Person {key: 4, name: 'Diana', acctbal: 28, mktsegment: 'SF'})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS {weight: 2015}]->(b)")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (c:Person {key: 3}) CREATE (a)-[:KNOWS {weight: 2018}]->(c)")
    CypherWrite.execute(s,
      "MATCH (b:Person {key: 2}) MATCH (d:Person {key: 4}) CREATE (b)-[:KNOWS {weight: 2020}]->(d)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  test("age filter with ordering") {
    assert(rows(
      "MATCH (p:Person) WHERE p.acctbal > 27 RETURN p.name AS nm ORDER BY nm")
      == Seq(Seq("Alice"), Seq("Charlie"), Seq("Diana")))
  }

  test("city grouping with implicit aggregation") {
    assert(rows(
      "MATCH (p:Person) RETURN p.mktsegment AS city, count(*) AS n ORDER BY city")
      == Seq(Seq("LA", 1L), Seq("NYC", 2L), Seq("SF", 1L)))
  }

  test("KNOWS expansion with relationship property") {
    assert(rows(
      """MATCH (a:Person)-[r:KNOWS]->(b:Person)
         RETURN a.name AS a, b.name AS b, r.weight AS since ORDER BY since""")
      == Seq(Seq("Alice", "Bob", 2015.0), Seq("Alice", "Charlie", 2018.0),
        Seq("Bob", "Diana", 2020.0)))
  }

  test("two-hop friend-of-friend") {
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(:Person)-[:KNOWS]->(c:Person)
         RETURN a.name AS a, c.name AS c""")
      == Seq(Seq("Alice", "Diana")))
  }

  test("OPTIONAL MATCH keeps friendless people with count 0") {
    assert(rows(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(f:Person)
         RETURN p.name AS nm, count(f) AS n ORDER BY nm""")
      == Seq(Seq("Alice", 2L), Seq("Bob", 1L), Seq("Charlie", 0L), Seq("Diana", 0L)))
  }

  test("NOT EXISTS: people who know nobody") {
    assert(rows(
      """MATCH (p:Person) WHERE NOT EXISTS((p)-[:KNOWS]->(q:Person))
         RETURN p.name AS nm ORDER BY nm""")
      == Seq(Seq("Charlie"), Seq("Diana")))
  }

  test("undirected expansion counts both directions") {
    assert(rows(
      """MATCH (p:Person {name: 'Bob'})-[:KNOWS]-(q:Person)
         RETURN q.name AS nm ORDER BY nm""")
      == Seq(Seq("Alice"), Seq("Diana")))
  }

  test("var-length 1..2 from Alice") {
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(x)
         RETURN x.name AS nm ORDER BY nm""")
      == Seq(Seq("Bob"), Seq("Charlie"), Seq("Diana")))
  }
}
