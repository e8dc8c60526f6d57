package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite, CypherDdl}
import graft.graph.{GraphStore, PropertyGraph}

/** Round-3 coverage: collect() zero-fill in aggregating CALL {}, null-safe
  * unique constraints, and APOC functions with no DuckDB analog
  * (urlencode/urldecode, phonetic, bitwise, parseInt/parseFloat).
  */
class Round3FeatureSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'Alice'}), (b:Person {key: 2, name: 'Bob'}),
              (c:Person {key: 3, name: 'Cara'})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS]->(b)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  test("aggregating CALL {} zero-fills collect() with an empty list, not null") {
    assert(rows(
      """MATCH (p:Person)
         CALL { WITH p MATCH (p)-[:KNOWS]->(q) RETURN collect(q.name) AS friends }
         RETURN p.name AS nm, size(friends) AS nf, friends ORDER BY nm""")
      == Seq(Seq("Alice", 1, Seq("Bob")), Seq("Bob", 0, Seq()), Seq("Cara", 0, Seq())))
  }

  test("unique constraint permits multiple nodes lacking the property (nulls don't collide)") {
    val g = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    CypherDdl.tryExecute(s, "CREATE CONSTRAINT c1 FOR (u:User) REQUIRE u.email IS UNIQUE")
    // two Users, neither has email — Neo4j allows this
    CypherWrite.execute(s, "CREATE (a:User {key: 1, name: 'x'}), (b:User {key: 2, name: 'y'})")
    assert(Cypher.run(s.snapshot, "MATCH (u:User) RETURN count(*) AS n")
      .collect().head.getLong(0) == 2L)
    // a real duplicate still trips it
    intercept[IllegalArgumentException] {
      CypherWrite.execute(s,
        "CREATE (a:User {key: 3, email: 'e@x'}), (b:User {key: 4, email: 'e@x'})")
    }
  }

  test("apoc.text.urlencode/urldecode round-trip; phonetic is soundex; bitwise ops") {
    val r = rows(
      """MATCH (p:Person {key: 1})
         RETURN apoc.text.urldecode(apoc.text.urlencode('a b&c')) AS rt,
                apoc.text.urlencode('a b&c') AS enc,
                apoc.text.phonetic('Smith') AS ph,
                apoc.text.phoneticDelta('Smith', 'Smythe') AS pd,
                apoc.bitwise.op(12, '&', 10) AS band,
                apoc.bitwise.op(12, '|', 10) AS bor,
                apoc.bitwise.op(12, '^', 10) AS bxor,
                apoc.bitwise.op(12, '<<', 2) AS shl,
                apoc.number.parseInt('42') AS pi,
                apoc.number.parseInt('nope') AS pn,
                apoc.number.parseFloat('2.5') AS pf""").head
    assert(r(0) == "a b&c")
    assert(r(1).toString.contains("%"))
    assert(r(2) == "S530" && r(3) == 0)
    assert(r(4) == 8L && r(5) == 14L && r(6) == 6L && r(7) == 48L)
    assert(r(8) == 42L && r(9) == null && r(10) == 2.5)
  }

  test("apoc.text.charAt accepts a non-literal index") {
    val r = rows(
      """MATCH (p:Person) WHERE p.key <= 3
         RETURN p.key AS k, apoc.text.charAt(p.name, p.key - 1) AS c ORDER BY k""")
    // Alice[0]='A', Bob[1]='o', Cara[2]='r'
    assert(r == Seq(Seq(1L, "A"), Seq(2L, "o"), Seq(3L, "r")))
  }

  test("apoc.coll frequencies/duplicatesWithCount shapes") {
    val r = rows(
      """MATCH (p:Person {key: 1})
         WITH ['a', 'b', 'a', 'c', 'a'] AS l
         RETURN apoc.map.get(apoc.coll.frequencies(l), 'a') AS fa,
                size(apoc.coll.duplicatesWithCount(l)) AS nd""").head
    assert(r(0) == 3 && r(1) == 1)
  }
}
