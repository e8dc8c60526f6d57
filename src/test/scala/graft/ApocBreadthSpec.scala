package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite}
import graft.functions.HashImpls
import graft.graph.{GraphStore, PropertyGraph}

/** Round-3 APOC long-tail tranche: hashing (64-bit wrapping loops as native
  * Catalyst expressions), json tree ops, map/convert/util completion,
  * temporal/date/number/math/diff remainder. Functions with a DuckDB replay
  * are additionally oracle-checked (q_cypher_apoc_json2 etc.); this spec
  * covers the semantics DuckDB can't replay.
  */
class ApocBreadthSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'Alice', age: 30}),
              (b:Person {key: 2, name: 'Bob'})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS {w: 2}]->(b)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  private def one(q: String): Seq[Any] = rows(q).head

  test("hashing 64-bit family matches the reference byte loops bit-for-bit") {
    val hello = "hello".getBytes("UTF-8")
    // engine output == direct JVM replay of hashing.go
    val r = one(
      """RETURN apoc.hashing.fnv164('hello') AS f1,
                apoc.hashing.fnv1a64('hello') AS f1a,
                apoc.hashing.cityHash64('hello') AS city,
                apoc.hashing.murmurHash3('hello', 0) AS mm,
                apoc.hashing.xxHash32('hello', 0) AS x32,
                apoc.hashing.xxHash64('hello', 0) AS x64,
                apoc.hashing.jumpHash(12345, 10) AS jmp,
                apoc.hashing.rendezvousHash('key', ['n1','n2','n3']) AS rdv,
                apoc.hashing.consistentHash('hello', 16) AS ch""")
    assert(r(0) == HashImpls.fnv164(hello))
    assert(r(1) == HashImpls.fnv1a64(hello))
    assert(r(2) == HashImpls.fnv1a64(hello)) // cityHash64 aliases fnv1a64
    assert(r(3) == HashImpls.murmur3(hello, 0L))
    assert(r(4) == HashImpls.xxhash32(hello, 0L))
    assert(r(5) == HashImpls.xxhash64(hello, 0L))
    assert(r(6) == HashImpls.jumpHash(12345L, 10))
    assert(r(7) == HashImpls.rendezvous(
      org.apache.spark.unsafe.types.UTF8String.fromString("key"),
      Array("n1", "n2", "n3").map(org.apache.spark.unsafe.types.UTF8String.fromString)).toString)
    assert(r(8) == java.lang.Long.remainderUnsigned(HashImpls.fnv1a64(hello), 16).toInt)
    // known-answer check: FNV-1a64("hello") is the published 0xA430D84680AABD0B
    assert(HashImpls.fnv1a64(hello) == java.lang.Long.parseUnsignedLong("a430d84680aabd0b", 16))
    // murmur3 with the canonical seed-0 test vector
    assert(HashImpls.murmur3("".getBytes, 0) == 0L)
  }

  test("json family: parse/compact/type/values + tree rewrites") {
    val r = one(
      """RETURN apoc.json.compact(' {"b": 2, "a": {"x": [1, 2]}} ') AS compact,
                apoc.json.type('{"a":1}') AS tObj,
                apoc.json.type('[1]') AS tArr,
                apoc.json.type('"s"') AS tStr,
                apoc.json.type('3.5') AS tNum,
                apoc.json.type('true') AS tBool,
                apoc.json.type('{bad') AS tBad,
                apoc.json.pretty('{"b":1,"a":{"c":2}}') AS pretty,
                apoc.json.flatten('{"user":{"name":"Alice","meta":{"n":1}},"top":true}') AS flat,
                apoc.json.unflatten('{"user.name":"Alice"}') AS unflat,
                apoc.json.set('{"a":{"b":1}}', '$.a.c', 5) AS setp,
                apoc.json.delete('{"a":{"b":1,"c":2}}', '$.a.c') AS delp,
                apoc.json.merge('{"a":1,"z":0}', '{"b":2,"a":9}') AS mrg""")
    assert(r(0) == """{"a":{"x":[1,2]},"b":2}""")
    assert(r.slice(1, 7) == Seq("object", "array", "string", "number", "boolean", "invalid"))
    assert(r(7) ==
      "{\n  \"a\": {\n    \"c\": 2\n  },\n  \"b\": 1\n}")
    assert(r(8) == """{"top":true,"user.meta.n":1,"user.name":"Alice"}""")
    assert(r(9) == """{"user":{"name":"Alice"}}""")
    assert(r(10) == """{"a":{"b":1,"c":5}}""")
    assert(r(11) == """{"a":{"b":1}}""")
    assert(r(12) == """{"a":9,"b":2,"z":0}""")
  }

  test("map completion: group/flatten/set families") {
    // Cypher map LITERALS compile to structs; the apoc.map family operates
    // on true MapType values, so build via fromLists (the reference's own
    // constructor surface)
    val r = one(
      """WITH apoc.map.fromLists(['a', 'b'], [1, 2]) AS m
         RETURN apoc.map.keys(m) AS ks,
                apoc.map.mergeList([apoc.map.fromLists(['a'], [1]),
                                    apoc.map.fromLists(['b'], [2]),
                                    apoc.map.fromLists(['a'], [3])]) AS ml,
                apoc.map.setLists(m, ['c'], [3]) AS sl,
                apoc.map.setPairs(apoc.map.fromLists(['a'], ['1']),
                                  [['c', '3'], ['d', '4']]) AS sp,
                apoc.map.setValues(apoc.map.fromLists(['a'], ['1']),
                                   ['c', '3', 'd', '4']) AS sv,
                apoc.map.groupBy([apoc.map.fromLists(['k', 'v'], ['x', '1']),
                                  apoc.map.fromLists(['k', 'v'], ['y', '2']),
                                  apoc.map.fromLists(['k', 'v'], ['x', '3'])], 'k') AS gb,
                apoc.map.unflatten(apoc.map.fromLists(['a.b', 'a.c', 'd'], [1, 2, 3])) AS uf,
                apoc.map.dropNullValues(apoc.map.fromLists(['a', 'b'], ['1', null])) AS dn""")
    assert(r(0) == Seq("a", "b"))
    assert(r(1).asInstanceOf[Map[String, Any]] == Map("a" -> 3L, "b" -> 2L))
    assert(r(2).asInstanceOf[Map[String, Any]] == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    assert(r(3).asInstanceOf[Map[String, Any]] == Map("a" -> "1", "c" -> "3", "d" -> "4"))
    assert(r(4).asInstanceOf[Map[String, Any]] == Map("a" -> "1", "c" -> "3", "d" -> "4"))
    val gb = r(5).asInstanceOf[Map[String, scala.collection.Seq[Map[String, String]]]]
    assert(gb("x").map(_("v")).toSeq == Seq("1", "3") &&
      gb("y").map(_("v")).toSeq == Seq("2"))
    val uf = r(6).asInstanceOf[Map[String, Map[String, Any]]]
    assert(uf("a") == Map("b" -> 1L, "c" -> 2L) && uf("d") == Map("d" -> 3L))
    assert(r(7).asInstanceOf[Map[String, Any]] == Map("a" -> "1"))
  }

  test("util completion: when/case/validate/merge/entity predicates/compress") {
    val r = one(
      """MATCH (a:Person {key: 1})-[r:KNOWS]->(b)
         RETURN apoc.util.when(a.age > 20, 'old', 'young') AS w,
                apoc.util.case([a.age = 30, 'thirty', a.age = 40, 'forty'], 'other') AS c,
                apoc.util.case([a.age = 99, 'no'], 'fallback') AS cd,
                apoc.util.coalesce(null, null, a.name) AS co,
                apoc.util.merge(apoc.map.fromLists(['x'], [1]),
                                apoc.map.fromLists(['y'], [2])) AS mm,
                apoc.util.merge([1, 2], [3]) AS lm,
                apoc.util.isNode(a) AS isn, apoc.util.isRelationship(r) AS isr,
                apoc.util.isNode(r) AS notn,
                apoc.util.decompress(apoc.util.compress(a.name)) AS rt,
                apoc.util.validate(a.age > 99, 'impossible') AS ok""")
    assert(r.take(4) == Seq("old", "thirty", "fallback", "Alice"))
    assert(r(4).asInstanceOf[Map[String, Any]] == Map("x" -> 1L, "y" -> 2L))
    assert(r(5) == Seq(1L, 2L, 3L))
    assert(r.slice(6, 10) == Seq(true, true, false, "Alice"))
    assert(r(10) == true)
    intercept[Exception] {
      rows("MATCH (a:Person {key: 1}) RETURN apoc.util.validate(a.age = 30, 'is thirty') AS x")
    }
  }

  test("temporal/date completion: format/parse/duration/round/timezone") {
    val r = one(
      """WITH datetime('2024-03-15T14:40:00Z') AS t
         RETURN apoc.temporal.format(t, 'yyyy-MM-dd HH:mm') AS fm,
                apoc.temporal.parse('2024-01-15', 'yyyy-MM-dd') AS ps,
                apoc.temporal.duration(90, 'minutes') AS dur,
                apoc.temporal.formatDuration(apoc.temporal.duration(5445, 'seconds'), 'x') AS fd,
                apoc.temporal.round(t, 'hour') AS rh,
                apoc.temporal.timezone(t, 'America/New_York') AS tz,
                apoc.date.toUnixTime(t) AS tu,
                apoc.date.fromUnixTime(1705276800) AS fu""")
    assert(r(0) == "2024-03-15 14:40")
    assert(r(1).toString.startsWith("2024-01-15"))
    assert(r(2) == 90L * 60L * 1000000000L)
    assert(r(3) == "01:30:45")
    assert(r(4).toString.startsWith("2024-03-15 15:00")) // 14:40 rounds up
    assert(r(5).toString.startsWith("2024-03-15 10:40")) // March 15 is EDT (UTC-4)
    assert(r(6) == 1710513600L)
    assert(r(7).toString.startsWith("2024-01-15"))
  }

  test("number/math/diff completion") {
    val r = one(
      """WITH apoc.map.fromLists(['a', 'b', 'c'], [1, 2, 3]) AS m1,
              apoc.map.fromLists(['b', 'c', 'd'], [2, 9, 4]) AS m2
         RETURN apoc.number.exact(2.0) AS e1, apoc.number.exact(2.5) AS e2,
                apoc.number.parse('1,234.5') AS np,
                apoc.math.stdev([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]) AS sd,
                apoc.math.nextPrime(13) AS pr,
                apoc.diff.summary(apoc.diff.maps(m1, m2)) AS sm,
                apoc.diff.merge(m1, m2, 'prefer_old') AS po,
                apoc.diff.merge(m1, m2, 'combine') AS cb,
                apoc.diff.patch(m1, apoc.diff.maps(m1, m2), m2) AS pt""")
    assert(r(0) == "2" && r(1) == "2.5")
    assert(r(2) == 1234.5)
    assert(r(3) == 2.0) // the reference's own docstring vector
    assert(r(4) == 17L)
    assert(r(5).asInstanceOf[Map[String, Any]] ==
      Map("added" -> 1, "removed" -> 1, "changed" -> 1, "unchanged" -> 1))
    assert(r(6).asInstanceOf[Map[String, Any]] ==
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
    assert(r(7).asInstanceOf[Map[String, Any]] ==
      Map("a" -> 1L, "b" -> 4L, "c" -> 12L, "d" -> 4L))
    // patch(m1, diff(m1→m2), m2) reconstructs m2
    assert(r(8).asInstanceOf[Map[String, Any]] ==
      Map("b" -> 2L, "c" -> 9L, "d" -> 4L))
  }

  test("apoc CALL surface: neighbors/paths/algo over the diamond graph") {
    // extend the store into a diamond + chord:
    //   A(1)→B(2), A→D(4), B→E(5), D→E, E→A   (KNOWS, traversed undirected)
    CypherWrite.execute(store,
      "CREATE (d:Person {key: 4, name: 'Dan'}), (e:Person {key: 5, name: 'Eve'})")
    for ((x, y) <- Seq((1, 4), (2, 5), (4, 5), (5, 1)))
      CypherWrite.execute(store,
        s"MATCH (x:Person {key: $x}) MATCH (y:Person {key: $y}) CREATE (x)-[:KNOWS]->(y)")

    assert(rows("""CALL apoc.neighbors.atHop('Person:1', 'KNOWS', 1) YIELD node_id
                   RETURN node_id ORDER BY node_id""").flatten ==
      Seq("Person:2", "Person:4", "Person:5"))
    assert(rows("""CALL apoc.neighbors.toHop('Person:1', 'KNOWS', 2) YIELD node_id
                   RETURN count(*) AS n""").head == Seq(4L)) // dist ≤ 1 incl. start
    // DFS with sorted-neighbor order: A(0) → B(1) → E(2); D at depth 3 > 2
    // is cut from E, then reached as A's next child at depth 1
    assert(rows("""CALL apoc.neighbors.dfs('Person:1', 'KNOWS', 2)
                   YIELD visit_order, node_id, depth
                   RETURN node_id, depth ORDER BY visit_order""") ==
      Seq(Seq("Person:1", 0), Seq("Person:2", 1), Seq("Person:5", 2), Seq("Person:4", 1)))
    assert(rows("CALL apoc.neighbors.count('Person:1', 'KNOWS', 1) YIELD value RETURN value")
      .head == Seq(3L))
    assert(rows("CALL apoc.neighbors.exists('Person:1', 'KNOWS', 1) YIELD value RETURN value")
      .head == Seq(true))

    // simple paths A→E within 2 hops: direct (1), via B, via D (2 each)
    assert(rows("""CALL apoc.paths.all('Person:1', 'Person:5', 'KNOWS', 2) YIELD length
                   RETURN length ORDER BY length""").flatten == Seq(1, 2, 2))
    assert(rows("""CALL apoc.paths.shortest('Person:1', 'Person:5', 'KNOWS', 2) YIELD length
                   RETURN length""").head == Seq(1))
    assert(rows("""CALL apoc.paths.kShortest('Person:1', 'Person:5', 'KNOWS', 2, 2) YIELD length
                   RETURN count(*) AS n""").head == Seq(2L))
    // all three are pairwise node-disjoint (interiors B, D, ∅)
    assert(rows("""CALL apoc.paths.disjoint('Person:1', 'Person:5', 'KNOWS', 2, 3) YIELD path
                   RETURN count(*) AS n""").head == Seq(3L))
    assert(rows("""CALL apoc.paths.edgeDisjoint('Person:1', 'Person:5', 'KNOWS', 2, 3) YIELD path
                   RETURN count(*) AS n""").head == Seq(3L))
    // hamiltonian with target count 3: the two 3-node routes
    assert(rows("""CALL apoc.paths.hamiltonian('Person:1', 'Person:5', 3, 'KNOWS') YIELD path
                   RETURN count(*) AS n""").head == Seq(2L))
    // reference cycles surface = All(start, start) = just the trivial path
    assert(rows("""CALL apoc.paths.cycles('Person:1', 'KNOWS', 3) YIELD length
                   RETURN length""").flatten == Seq(0))
    assert(rows("CALL apoc.paths.eulerian('Person:1', 'Person:5') YIELD length RETURN length")
      .isEmpty)

    // greedy vertex cover: A (degree 3) then E covers all five edges
    assert(rows("CALL apoc.algo.cover('KNOWS') YIELD node_id RETURN node_id ORDER BY node_id")
      .flatten == Seq("Person:1", "Person:5"))
    // closeness of A: B, D, E all at distance 1 → 3/3
    assert(rows("""CALL apoc.algo.closenessCentrality('Person:1', 'KNOWS', 3) YIELD score
                   RETURN score""").head == Seq(1.0))
  }

  test("apoc.paths path-value functions: reverse/slice/merge/common/unique") {
    val r = one(
      """MATCH p = shortestPath((a:Person {key: 2})-[:KNOWS*..3]-(d:Person {key: 4}))
         RETURN p, apoc.paths.reverse(p) AS rp, apoc.paths.slice(p, 0, 2) AS sp,
                apoc.paths.common([p, p]) AS cm, apoc.paths.unique([p, p]) AS un,
                apoc.paths.merge([p, p]) AS mg""")
    val row = r(0).asInstanceOf[org.apache.spark.sql.Row]
    val nodes = row.getAs[scala.collection.Seq[String]]("path").toSeq
    val len = row.getAs[Int]("length")
    def pathOf(v: Any): (Seq[String], Int) = {
      val w = v.asInstanceOf[org.apache.spark.sql.Row]
      (w.getAs[scala.collection.Seq[String]]("path").toSeq, w.getAs[Int]("length"))
    }
    assert(pathOf(r(1)) == ((nodes.reverse, len)))
    assert(pathOf(r(2)) == ((nodes.take(2), 1)))
    assert(r(3).asInstanceOf[scala.collection.Seq[String]].toSeq == nodes.sorted)
    assert(r(4).asInstanceOf[scala.collection.Seq[String]].toSeq == nodes.distinct.sorted)
    assert(pathOf(r(5)) == ((nodes ++ nodes, 2 * len)))
  }

  test("apoc.node/rel accessors over the diamond graph") {
    // diamond from the CALL-surface test: A→B, A→D, B→E, D→E, E→A
    val r = one(
      """MATCH (a:Person {key: 1})
         RETURN apoc.node.degree(a, 'KNOWS') AS d,
                apoc.node.degreeIn(a, 'KNOWS') AS di,
                apoc.node.degreeOut(a, 'KNOWS') AS do,
                apoc.node.neighbors(a, 'KNOWS') AS nb,
                apoc.node.neighborsOut(a, 'KNOWS') AS nbo,
                apoc.node.neighborsIn(a, 'KNOWS') AS nbi,
                apoc.node.relationshipTypes(a) AS rt,
                apoc.node.isDense(a, 2) AS dense2,
                apoc.node.isDense(a, 5) AS dense5,
                apoc.node.relationshipExists(a, 'KNOWS>') AS reOut,
                apoc.node.relationshipExists(a, '<KNOWS') AS reIn,
                apoc.node.relationshipExists(a, 'MISSING') AS reNo,
                size(apoc.node.relationships(a, 'KNOWS')) AS nrels,
                size(apoc.node.relationshipsOut(a, 'KNOWS')) AS nout,
                size(apoc.node.relationshipsIn(a, 'KNOWS')) AS nin""")
    assert(r.take(3) == Seq(3L, 1L, 2L))
    assert(r.takeRight(3) == Seq(3, 2, 1)) // incident rel-id lists
    assert(r(3).asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("Person:2", "Person:4", "Person:5"))
    assert(r(4).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("Person:2", "Person:4"))
    assert(r(5).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("Person:5"))
    assert(r(6).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("KNOWS"))
    assert(r.slice(7, 12) == Seq(true, false, true, true, false))

    val r2 = one(
      """MATCH (a:Person {key: 1}), (b:Person {key: 2})
         RETURN apoc.node.connected(a, b, 'KNOWS') AS cab,
                apoc.node.equals(a, a) AS eqa,
                apoc.node.property(apoc.node.setProperty(a, 'x', 9), 'x') AS sp,
                apoc.node.labels(apoc.node.addLabel(a, 'Zed'))[1] AS al,
                size(apoc.node.properties(apoc.node.removeProperty(a, 'name'))) AS np""")
    assert(r2.take(2) == Seq(true, true))
    assert(r2(2) == "9" && r2(3) == "Zed")
    // Alice's property MAP carries {name, age} (key is a hoisted column)
    // → 1 entry after removing name
    assert(r2(4) == 1)

    val r3 = one(
      """MATCH (a:Person {key: 1})-[r:KNOWS]->(b:Person {key: 2})
         RETURN apoc.rel.startNode(r) AS sn, apoc.rel.endNode(r) AS en,
                apoc.rel.nodes(r) AS ns,
                apoc.rel.otherNode(r, a) AS ona, apoc.rel.direction(r, a) AS dira,
                apoc.rel.direction(r, b) AS dirb, apoc.rel.isLoop(r) AS lp,
                apoc.rel.isBetween(r, b, a) AS btw,
                apoc.rel.isDirectedBetween(r, a, b) AS dab,
                apoc.rel.isDirectedBetween(r, b, a) AS dba,
                apoc.rel.isType(r, 'KNOWS') AS it,
                apoc.rel.isAnyType(r, ['X', 'KNOWS']) AS iat,
                apoc.rel.hasProperty(r, 'missing') AS hp,
                apoc.rel.weight(r, 'missing', 2.5) AS w""")
    assert(r3(0) == "Person:1" && r3(1) == "Person:2")
    assert(r3(2).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("Person:1", "Person:2"))
    assert(r3.drop(3) == Seq("Person:2", "OUTGOING", "INCOMING", false, true,
      true, false, true, true, false, 2.5))
  }

  test("apoc.stats: moments, percentiles, summary on the reference's own vectors") {
    val r = one(
      """WITH [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0] AS xs
         RETURN apoc.stats.mean(xs) AS mn, apoc.stats.variance(xs) AS vr,
                apoc.stats.stdDev(xs) AS sd, apoc.stats.median(xs) AS md,
                apoc.stats.mode(xs) AS mo, apoc.stats.skewness(xs) AS sk,
                apoc.stats.kurtosis(xs) AS kt,
                apoc.stats.summary(xs)['Q1'] AS q1,
                apoc.stats.summary(xs)['count'] AS ct,
                apoc.stats.percentile(xs, 0.5) AS p50,
                apoc.stats.histogram(xs, 7) AS hg,
                apoc.stats.outliers([1.0, 2.0, 3.0, 4.0, 5.0, 100.0]) AS out""")
    assert(r(0) == 5.0 && r(1) == 4.0 && r(2) == 2.0 && r(3) == 4.5 && r(4) == 4.0)
    // hand-computed from the reference formulas: z = (x−5)/2,
    // Σz³ = 5.25 → skew = 8/42·5.25 = 1.0;
    // Σz⁴ = 22.25 → kurt = 72/210·22.25 − 3·49/30 = 2.72857…
    assert(math.abs(r(5).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(r(6).asInstanceOf[Double] - (72.0 / 210.0 * 22.25 - 4.9)) < 1e-12)
    assert(r(7) == 4.0 && r(8) == 8.0 && r(9) == 4.5) // Q1: idx 1.75 between two 4.0s
    // bins of width 1 over [2,9]: 2|—|4,4,4|5,5|—|7|—|9(clamped)
    assert(r(10).asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 0, 3, 2, 0, 1, 1))
    assert(r(11).asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(100.0))
  }

  test("apoc.stats.degrees over the diamond graph") {
    // isolated node exercises the degree-0 union branch
    CypherWrite.execute(store, "CREATE (z:Person {key: 6, name: 'Zed'})")
    // KNOWS degrees: A=3, B=2, D=2, E=3, Zed=0
    val r = one("""CALL apoc.stats.degrees('KNOWS')
                   YIELD min, max, mean, median, stdDev RETURN min, max, mean, median""")
    assert(r == Seq(0L, 3L, 2.0, 2.0))
  }

  test("apoc.xml family: parse/manipulate/query/convert") {
    val r = one(
      """WITH '<a x="1"><b>hi</b><c/></a>' AS x
         RETURN apoc.xml.parse(' ' + x) AS canon,
                apoc.xml.validate(x) AS ok,
                apoc.xml.validate('<oops') AS bad,
                apoc.xml.getAttribute(x, 'x') AS ga,
                apoc.xml.getText(apoc.xml.query(x, '//b')[0]) AS bt,
                size(apoc.xml.query(x, '/b')) AS nb,
                apoc.xml.setAttribute(x, 'y', '2') AS sa,
                apoc.xml.setText('<t/>', 'v') AS st,
                apoc.xml.addChild('<p/>', '<q>z</q>') AS ac,
                apoc.xml.removeChild(x, 'c') AS rc,
                apoc.xml.create('item', '{"id":"1"}', 'txt') AS cr,
                apoc.xml.toJson('<m k="v">t</m>') AS tj,
                apoc.xml.escape('<x> & "y"') AS esc,
                apoc.xml.unescape(apoc.xml.escape('<x> & "y"')) AS rt,
                apoc.xml.minify('<a>' + apoc.text.fromCodePoint(10) + '  <b/>' + apoc.text.fromCodePoint(10) + '</a>') AS mf,
                apoc.xml.getNamespace(apoc.xml.namespace('<n/>', 'ns', 'http://e.x'), 'ns') AS gns""")
    assert(r(0) == """<a x="1"><b>hi</b><c/></a>""")
    assert(r(1) == true && r(2) == false)
    assert(r(3) == "1" && r(4) == "hi" && r(5) == 1)
    assert(r(6) == """<a x="1" y="2"><b>hi</b><c/></a>""")
    assert(r(7) == "<t>v</t>")
    assert(r(8) == "<p><q>z</q></p>")
    assert(r(9) == """<a x="1"><b>hi</b></a>""")
    assert(r(10) == """<item id="1">txt</item>""")
    assert(r(11) == """{"attributes":{"k":"v"},"name":"m","text":"t"}""")
    assert(r(12) == "&lt;x&gt; &amp; &quot;y&quot;")
    assert(r(13) == """<x> & "y"""")
    assert(r(14) == "<a><b/></a>")
    assert(r(15) == "http://e.x")
  }

  test("apoc.spatial family: great-circle geometry over point structs") {
    val r = one(
      """WITH point({x: -0.1278, y: 51.5074}) AS london,
              point({x: 2.3522, y: 48.8566}) AS paris
         RETURN apoc.spatial.distance(london, paris) AS d,
                apoc.spatial.haversineDistance(51.5074, -0.1278, 48.8566, 2.3522) AS hd,
                apoc.spatial.vincentyDistance(51.5074, -0.1278, 48.8566, 2.3522) AS vd,
                apoc.spatial.bearing(london, paris) AS br,
                apoc.spatial.midpoint(london, paris).y AS mlat,
                apoc.spatial.boundingBox([london, paris])['minLat'] AS bb,
                apoc.spatial.within(london, apoc.spatial.boundingBox([london, paris])) AS w,
                apoc.spatial.centroid([london, paris]).y AS cy,
                apoc.spatial.nearest(london, [paris, london]).y AS ny,
                size(apoc.spatial.kNearest(london, [paris, london], 1)) AS kn,
                size(apoc.spatial.withinDistance(london, [paris, london], 100.0)) AS wd,
                apoc.spatial.toGeoJSON(london).coordinates[1] AS gj,
                apoc.spatial.encodeGeohash(london, 9) AS gh,
                apoc.spatial.decodeGeohash('u4pruydqq').y AS dg""")
    // London→Paris great-circle ≈ 343.6 km; the exact value comes from the
    // same double arithmetic on both sides
    assert(math.abs(r(0).asInstanceOf[Double] - 343.6) < 1.0)
    assert(r(1) == r(0))
    assert(r(2).asInstanceOf[Double] == r(0).asInstanceOf[Double] * 1000)
    assert(math.abs(r(3).asInstanceOf[Double] - 148.1) < 1.0) // SSE bearing
    assert(math.abs(r(4).asInstanceOf[Double] - 50.2) < 0.2)
    assert(r(5) == 48.8566)
    assert(r(6) == true)
    assert(math.abs(r(7).asInstanceOf[Double] - 50.182) < 0.001)
    assert(r(8) == 51.5074) // london itself is nearest to london
    assert(r(9) == 1 && r(10) == 1) // only london within 100 km
    assert(r(11) == 51.5074) // geojson coordinates = [lon, lat]
    assert(r(12) == "u4pruydqq" && r(13) == 51.5074) // reference placeholders
  }

  test("diff.nodes mirrors diff.maps over entity property maps") {
    val r = one(
      """MATCH (a:Person {key: 1}), (b:Person {key: 2})
         RETURN apoc.diff.summary(apoc.diff.nodes(a, b)) AS s""")
    val s = r(0).asInstanceOf[Map[String, Any]]
    // a has {key,name,age}; b has {key,name}: age removed, key+name changed
    assert(s("removed") == 1 && s("added") == 0)
  }
}
