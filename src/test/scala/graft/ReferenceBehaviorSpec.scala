package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Mirrors of the reference's OWN Cypher regression tests — each test here
  * replays a (fixture, query, expected) triple lifted from
  * the reference's pkg/cypher Go test files, so behavioral drift from the
  * reference's semantics fails loudly. Fixtures are built through the
  * engine's own CREATE path on an empty store, like the reference builds
  * them through its executor.
  */
class ReferenceBehaviorSpec extends AnyFunSuite {
  import TestSpark._

  /** Fresh empty store with the standard node/edge schema. */
  private def emptyStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
  }

  /** The aggregation-test fixture (aggregation_bugs_test.go:17): 5 File
    * nodes with extensions (.ts ×2, .md ×3) and 2 without.
    */
  private def fileStore(): GraphStore = {
    val s = emptyStore()
    Seq(
      "CREATE (f:File {key: 1, name: 'file1.ts', extension: '.ts'})",
      "CREATE (f:File {key: 2, name: 'file2.ts', extension: '.ts'})",
      "CREATE (f:File {key: 3, name: 'file3.md', extension: '.md'})",
      "CREATE (f:File {key: 4, name: 'file4.md', extension: '.md'})",
      "CREATE (f:File {key: 5, name: 'file5.md', extension: '.md'})",
      "CREATE (f:File {key: 6, name: 'noext'})",
      "CREATE (f:File {key: 7, name: 'noext2'})"
    ).foreach(CypherWrite.execute(s, _))
    s
  }

  test("WHERE IS NOT NULL before WITH aggregation (aggregation_bugs_test.go:43)") {
    val s = fileStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH (f:File)
         WHERE f.extension IS NOT NULL
         WITH f.extension AS ext, COUNT(f) AS count
         RETURN ext, count
         ORDER BY count DESC""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rows == List((".md", 3L), (".ts", 2L)))
  }

  test("COUNT in WITH then WHERE on the grouping key (aggregation_bugs_test.go:111)") {
    val s = fileStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH (f:File)
         WITH f.extension AS ext, COUNT(f) AS count
         WHERE ext IS NOT NULL
         RETURN ext, count
         ORDER BY count DESC""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rows == List((".md", 3L), (".ts", 2L)))
    // implicit GROUP BY keeps the null group when not filtered
    val all = Cypher.run(s.snapshot,
      "MATCH (f:File) WITH f.extension AS ext, COUNT(*) AS count RETURN ext, count")
      .collect()
    assert(all.length == 3) // .ts, .md, null
  }

  test("count(prop) excludes nulls; count(*) includes all (aggregation_bugs_test.go:247)") {
    val s = fileStore()
    val cExt = Cypher.run(s.snapshot,
      "MATCH (f:File) RETURN count(f.extension) AS count_ext").collect().head.getLong(0)
    val cAll = Cypher.run(s.snapshot,
      "MATCH (f:File) RETURN count(*) AS count_all").collect().head.getLong(0)
    assert(cExt == 5L && cAll == 7L)
  }

  test("COLLECT(DISTINCT prop) over a column with nulls (aggregation_bugs_test.go:282)") {
    val s = fileStore()
    val exts = Cypher.run(s.snapshot,
      "MATCH (f:File) WITH COLLECT(DISTINCT f.extension) AS extensions RETURN extensions")
      .collect().head.getSeq[String](0)
    // Cypher collect() skips nulls: exactly the two real extensions
    assert(exts.toSet == Set(".ts", ".md"))
  }

  test("sum/avg skip nulls; min/max of strings (aggregation_bugs_test.go:308)") {
    val s = emptyStore()
    Seq(
      "CREATE (m:Metric {key: 1, acctbal: 10.0})",
      "CREATE (m:Metric {key: 2, acctbal: 20.0})",
      "CREATE (m:Metric {key: 3, acctbal: 30.0})",
      "CREATE (m:Metric {key: 4})"
    ).foreach(CypherWrite.execute(s, _))
    val r = Cypher.run(s.snapshot,
      """MATCH (m:Metric)
         RETURN sum(m.acctbal) AS s, avg(m.acctbal) AS a,
                min(m.acctbal) AS mn, max(m.acctbal) AS mx,
                count(m.acctbal) AS c""").collect().head
    assert(r.getDouble(0) == 60.0 && r.getDouble(1) == 20.0)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 30.0 && r.getLong(4) == 3L)
  }

  test("WHERE on an aggregated value via WITH (aggregation_bugs_test.go:344)") {
    val s = fileStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH (f:File)
         WITH f.extension AS ext, COUNT(f) AS cnt
         WHERE cnt > 2
         RETURN ext, cnt""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rows == List((".md", 3L)))
  }

  test("ORDER BY aggregated value ascending (aggregation_bugs_test.go:374)") {
    val s = fileStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH (f:File)
         WHERE f.extension IS NOT NULL
         WITH f.extension AS ext, COUNT(f) AS cnt
         RETURN ext, cnt ORDER BY cnt ASC""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rows == List((".ts", 2L), (".md", 3L)))
  }

  test("OPTIONAL MATCH keeps unmatched rows with nulls (clauses_optional_fast.go)") {
    val s = emptyStore()
    Seq(
      "CREATE (a:Person {key: 1, name: 'a'}), (b:Person {key: 2, name: 'b'})",
      """MATCH (a:Person {key: 1}), (b:Person {key: 2})
         CREATE (a)-[:KNOWS {weight: 1}]->(b)"""
    ).foreach(CypherWrite.execute(s, _))
    val rows = Cypher.run(s.snapshot,
      """MATCH (p:Person)
         OPTIONAL MATCH (p)-[:KNOWS]->(q:Person)
         RETURN p.name AS pn, q.name AS qn ORDER BY pn""")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toList
    assert(rows == List(("a", Some("b")), ("b", None)))
  }

  test("chained WITH+MATCH: a failed mid-chain MATCH drops the row (chained_with_match_test.go:188)") {
    val s = emptyStore()
    Seq(
      "CREATE (a:Doc {key: 1, name: 'a'})",
      "CREATE (b:Doc {key: 2, name: 'b'})"
    ).foreach(CypherWrite.execute(s, _))
    // first MATCH succeeds, second MATCH (no such node) kills the row —
    // the whole query returns no rows, like the reference's chained merge
    val rows = Cypher.run(s.snapshot,
      """MATCH (a:Doc {key: 1})
         WITH a
         MATCH (c:Doc {key: 99})
         RETURN a.name AS an, c.name AS cn""").collect()
    assert(rows.isEmpty)
    // and the two-hop chain where both exist returns the pair
    val ok = Cypher.run(s.snapshot,
      """MATCH (a:Doc {key: 1})
         WITH a
         MATCH (b:Doc {key: 2})
         RETURN a.name AS an, b.name AS bn""").collect()
    assert(ok.map(r => (r.getString(0), r.getString(1))).toList == List(("a", "b")))
  }

  test("CASE inside aggregates: conditional count/sum (case_aggregation_test.go:14)") {
    val s = emptyStore()
    Seq(
      "CREATE (e:Entry {key: 1, status: 'approved', score: 90})",
      "CREATE (e:Entry {key: 2, status: 'approved', score: 75})",
      "CREATE (e:Entry {key: 3, status: 'approved', score: 60})",
      "CREATE (e:Entry {key: 4, status: 'reject', score: 85})",
      "CREATE (e:Entry {key: 5, status: 'reject', score: 50})"
    ).foreach(CypherWrite.execute(s, _))
    val r = Cypher.run(s.snapshot,
      """MATCH (e:Entry)
         RETURN count(e) AS total,
                count(CASE WHEN e.status = 'approved' THEN 1 END) AS approved,
                count(CASE WHEN e.status = 'reject' THEN 1 END) AS rejected,
                sum(CASE WHEN e.status = 'approved' THEN 1 ELSE 0 END) AS approvedSum""")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 2L)))
    assert(r.getLong(3) == 3L)
  }

  test("CONTAINS in WHERE and inside CASE-in-count (case_aggregation_test.go:94)") {
    val s = emptyStore()
    Seq(
      "CREATE (e:Entry {key: 1, issues: 'informal tu usage'})",
      "CREATE (e:Entry {key: 2, issues: 'other issue'})",
      "CREATE (e:Entry {key: 3, issues: 'another tu problem'})"
    ).foreach(CypherWrite.execute(s, _))
    val whereCnt = Cypher.run(s.snapshot,
      "MATCH (e:Entry) WHERE e.issues CONTAINS 'tu' RETURN count(e) AS cnt")
      .collect().head.getLong(0)
    val caseCnt = Cypher.run(s.snapshot,
      """MATCH (e:Entry)
         RETURN count(CASE WHEN e.issues CONTAINS 'tu' THEN 1 END) AS n""")
      .collect().head.getLong(0)
    assert(whereCnt == 2L && caseCnt == 2L)
  }

  /** The area graph from failing_queries_test.go:22. */
  private def areaStore(): GraphStore = {
    val s = emptyStore()
    Seq(
      "CREATE (a:Area {key: 16, name: 'Enterprise Service Layer'})",
      "CREATE (p:POC {key: 1, name: 'POC Alpha'})",
      "CREATE (p:POC {key: 2, name: 'POC Beta'})",
      "CREATE (p:Person {key: 101, name: 'John Smith'})",
      "CREATE (p:Person {key: 102, name: 'Jane Doe'})",
      "CREATE (t:Team {key: 201, name: 'Core Team'})",
      "MATCH (a:Area {key: 16}), (p:POC {key: 1}) CREATE (a)-[:MANAGES]->(p)",
      "MATCH (a:Area {key: 16}), (t:Team {key: 201}) CREATE (a)-[:CONTAINS]->(t)",
      "MATCH (p:POC {key: 2}), (a:Area {key: 16}) CREATE (p)-[:BELONGS_TO]->(a)",
      "MATCH (p:POC {key: 1}), (x:Person {key: 101}) CREATE (p)-[:HAS_LEADER]->(x)",
      "MATCH (p:POC {key: 2}), (x:Person {key: 102}) CREATE (p)-[:HAS_CONTACT]->(x)"
    ).foreach(CypherWrite.execute(s, _))
    s
  }

  test("FAIL#1: CALL {} + undirected var-length path + length(path) in collect (failing_queries_test.go:45)") {
    // node entity values inside the map are projected to name (map values
    // must type-unify under Spark; the reference returns the whole node)
    val s = areaStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH (seed:Area {key: 16})
         CALL {
           WITH seed
           MATCH path = (seed)-[*1..2]-(connected)
           WHERE id(connected) <> id(seed)
           RETURN connected, length(path) AS dist
         }
         RETURN collect(DISTINCT {node: connected.name,
           labels: labels(connected)[0], distance: toString(dist)}) AS neighbors""")
      .collect()
    assert(rows.length == 1)
    val n = rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getString(2))).toSet
    assert(n == Set(("POC Alpha", "1"), ("POC Beta", "1"), ("Core Team", "1"),
      ("John Smith", "2"), ("Jane Doe", "2")))
  }

  test("FAIL#2: top-level path var + WITH + aggregated map collect (failing_queries_test.go:113)") {
    val s = areaStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH path = (seed:Area {key: 16})-[*1..2]-(connected)
         WHERE id(connected) <> id(seed)
         WITH seed, connected, length(path) AS dist
         RETURN seed.name AS seed_name,
                collect(DISTINCT {node: connected.name, distance: toString(dist)}) AS neighbors""")
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "Enterprise Service Layer")
    assert(rows.head.getSeq[Row](1).length == 5)
  }

  test("FAIL#3: relationships(path) rel-type chain on var-length paths (failing_queries_test.go:210)") {
    val s = areaStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH path = (seed:Area {key: 16})-[*1..2]-(connected)
         WHERE id(connected) <> id(seed)
         RETURN connected.name AS cname, length(path) AS dist,
                [r IN relationships(path) | type(r)] AS rel_chain""")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[String](2).toList)).toSet
    assert(rows == Set(
      ("POC Alpha", 1, List("MANAGES")),
      ("Core Team", 1, List("CONTAINS")),
      ("POC Beta", 1, List("BELONGS_TO")),
      ("John Smith", 2, List("MANAGES", "HAS_LEADER")),
      ("Jane Doe", 2, List("BELONGS_TO", "HAS_CONTACT"))))
  }

  test("nodes(path) returns the node-id sequence of a var-length path") {
    val s = areaStore()
    val rows = Cypher.run(s.snapshot,
      """MATCH path = (seed:Area {key: 16})-[:MANAGES*1..1]->(p:POC)
         RETURN size(nodes(path)) AS n, length(path) AS l""")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toList
    assert(rows == List((2, 1)))
  }

  test("length(path) inside collect over a 2-hop chain (failing_queries_test.go:286)") {
    val s = emptyStore()
    Seq(
      "CREATE (a:Node {key: 1, name: 'A'})",
      "CREATE (b:Node {key: 2, name: 'B'})",
      "CREATE (c:Node {key: 3, name: 'C'})",
      "MATCH (a:Node {key: 1}), (b:Node {key: 2}) CREATE (a)-[:REL1]->(b)",
      "MATCH (b:Node {key: 2}), (c:Node {key: 3}) CREATE (b)-[:REL2]->(c)"
    ).foreach(CypherWrite.execute(s, _))
    val res = Cypher.run(s.snapshot,
      """MATCH path = (a:Node {key: 1})-[*1..2]->(connected)
         RETURN collect({name: connected.name, distance: toString(length(path))}) AS results""")
      .collect().head.getSeq[Row](0)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(res == Set(("B", "1"), ("C", "2")))
  }

  test("count returns a zero row on an empty match (count_bug_test.go:17)") {
    val s = emptyStore()
    val r = Cypher.run(s.snapshot,
      "MATCH (x:Nothing) RETURN count(x) AS n").collect()
    assert(r.length == 1 && r.head.getLong(0) == 0L)
  }

  test("MERGE ON CREATE SET / ON MATCH SET / idempotency (merge_test.go:81)") {
    val s = emptyStore()
    // ON CREATE fires on first merge
    CypherWrite.execute(s,
      "MERGE (n:Counter {key: 1, name: 'hits'}) ON CREATE SET n.acctbal = 1")
    def count(): Double = Cypher.run(s.snapshot,
      "MATCH (n:Counter {name: 'hits'}) RETURN n.acctbal AS c")
      .collect().head.getDouble(0)
    assert(count() == 1.0)
    // ON MATCH fires on re-merge; ON CREATE must not
    CypherWrite.execute(s,
      """MERGE (n:Counter {key: 1, name: 'hits'})
         ON CREATE SET n.acctbal = 99
         ON MATCH SET n.acctbal = n.acctbal + 1""")
    assert(count() == 2.0)
    // idempotency: node count stays 1 across repeated merges
    CypherWrite.execute(s, "MERGE (n:Counter {key: 1, name: 'hits'})")
    val n = Cypher.run(s.snapshot,
      "MATCH (n:Counter) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == 1L)
  }

  test("MERGE relationship is idempotent (merge_test.go:226)") {
    val s = emptyStore()
    Seq(
      "CREATE (a:Doc {key: 1, name: 'f'}), (b:Chunk {key: 2, name: 'c'})",
      "MATCH (a:Doc {key: 1}), (b:Chunk {key: 2}) MERGE (a)-[:HAS_CHUNK]->(b)",
      "MATCH (a:Doc {key: 1}), (b:Chunk {key: 2}) MERGE (a)-[:HAS_CHUNK]->(b)"
    ).foreach(CypherWrite.execute(s, _))
    val n = Cypher.run(s.snapshot,
      "MATCH (:Doc)-[r:HAS_CHUNK]->(:Chunk) RETURN count(r) AS n")
      .collect().head.getLong(0)
    assert(n == 1L)
  }

  test("standalone RETURN string functions incl. unicode (string_functions_test.go:11)") {
    val s = emptyStore()
    def one(q: String): String =
      Cypher.run(s.snapshot, q).collect().head.getString(0)
    assert(one("RETURN reverse('hello') AS result") == "olleh")
    assert(one("RETURN reverse('hello 世界') AS result") == "界世 olleh")
    assert(one("RETURN reverse('') AS result") == "")
    assert(one("RETURN lpad('5', 3, '0') AS result") == "005")
    assert(one("RETURN rpad('ab', 4, '-') AS result") == "ab--")
  }

  test("list slices, out-of-range indexing, CASE null, keys on map literal, timestamp") {
    val s = emptyStore()
    def one(q: String) = Cypher.run(s.snapshot, q).collect().head
    // Neo4j slice semantics: 0-based, from-inclusive/to-exclusive,
    // negatives from the end, out-of-range clamps
    assert(one("RETURN [1,2,3][1..2] AS a").getSeq[Long](0) == Seq(2L))
    assert(one("WITH [1,2,3,4] AS l RETURN l[..2] AS a").getSeq[Long](0) == Seq(1L, 2L))
    assert(one("WITH [1,2,3,4] AS l RETURN l[2..] AS a").getSeq[Long](0) == Seq(3L, 4L))
    assert(one("WITH [1,2,3,4] AS l RETURN l[-2..] AS a").getSeq[Long](0) == Seq(3L, 4L))
    assert(one("WITH [1,2,3,4] AS l RETURN l[1..99] AS a").getSeq[Long](0) == Seq(2L, 3L, 4L))
    // out-of-range index is null, not an error
    assert(one("RETURN [1,2,3][5] AS a").isNullAt(0))
    // null WHEN condition is falsy
    assert(one("RETURN CASE WHEN null THEN 1 ELSE 2 END AS a").getLong(0) == 2L)
    // keys() over a map literal (struct-typed)
    assert(one("RETURN keys({a: 1, b: 2}) AS k").getSeq[String](0) == Seq("a", "b"))
    assert(one("RETURN timestamp() > 0 AS a").getBoolean(0))
    // missing map-literal key is null, not an analysis error
    assert(one("RETURN {a: 1}['b'] AS x").isNullAt(0))
  }

  test("toInteger parses float strings and truncates; bad strings are null") {
    val s = emptyStore()
    def one(q: String) = Cypher.run(s.snapshot, q).collect().head
    assert(one("RETURN toInteger('42') AS a").getLong(0) == 42L)
    assert(one("RETURN toInteger('4.9') AS a").getLong(0) == 4L)
    assert(one("RETURN toInteger('abc') AS a").isNullAt(0))
    assert(one("RETURN toInteger(4.9) AS a").getLong(0) == 4L)
    // direct numeric casts keep full long precision (no double roundtrip)
    assert(one("RETURN toInteger(9007199254740993) AS a").getLong(0) == 9007199254740993L)
    assert(one("RETURN [x IN ['1','2.5'] | toInteger(x)] AS a")
      .getSeq[Long](0) == Seq(1L, 2L))
  }

  test("CREATE then SET with += map merge (neo4j_compat_test.go:102)") {
    val s = emptyStore()
    CypherWrite.execute(s, "CREATE (n:Cfg {key: 1, name: 'cfg'})")
    CypherWrite.execute(s, "MATCH (n:Cfg {key: 1}) SET n.name = 'cfg2'")
    val r = Cypher.run(s.snapshot, "MATCH (n:Cfg {key: 1}) RETURN n.name AS nm")
      .collect().head.getString(0)
    assert(r == "cfg2")
  }

  test("DETACH DELETE with STARTS WITH / IN list predicates (neo4j_compat_test.go:197)") {
    val s = emptyStore()
    Seq(
      "CREATE (a:Itm {key: 1, name: 'tmp_one'})",
      "CREATE (a:Itm {key: 2, name: 'tmp_two'})",
      "CREATE (a:Itm {key: 3, name: 'keep_me'})"
    ).foreach(CypherWrite.execute(s, _))
    CypherWrite.execute(s,
      "MATCH (n:Itm) WHERE n.name STARTS WITH 'tmp_' DETACH DELETE n")
    val left = Cypher.run(s.snapshot, "MATCH (n:Itm) RETURN n.name AS nm")
      .collect().map(_.getString(0)).toList
    assert(left == List("keep_me"))
    CypherWrite.execute(s,
      "MATCH (n:Itm) WHERE n.name IN ['keep_me'] DETACH DELETE n")
    assert(Cypher.run(s.snapshot, "MATCH (n:Itm) RETURN count(*) AS c")
      .collect().head.getLong(0) == 0L)
  }

  test("DELETE then re-CREATE counts fresh nodes (count_bug_test.go:83)") {
    val s = emptyStore()
    CypherWrite.execute(s, "CREATE (t:Tmp {key: 1, name: 'x'})")
    CypherWrite.execute(s, "MATCH (t:Tmp) DETACH DELETE t")
    CypherWrite.execute(s, "CREATE (t:Tmp {key: 2, name: 'y'})")
    val r = Cypher.run(s.snapshot, "MATCH (t:Tmp) RETURN count(t) AS n, max(t.key) AS k")
      .collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
  }
}
