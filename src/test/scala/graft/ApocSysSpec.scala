package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{ApocSysProcs, Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** APOC system families: meta/schema catalogs, warmup caching, the log
  * ring, advisory locks, triggers firing on writes, periodic jobs, cypher
  * meta-procedures, and atomic property updates.
  */
class ApocSysSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    CypherWrite.execute(s,
      "CREATE (a:Person {key: 1, name: 'Alice', score: 10}), (b:Person {key: 2, name: 'Bob'})")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS]->(b)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] = {
    GraphStore.currentOption // touch to ensure init order
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq
  }

  test("meta catalog: labels, relTypes, cardinality, analyze") {
    assert(rows("CALL apoc.meta.nodeLabels() YIELD label RETURN label").flatten
      == Seq("Person"))
    assert(rows("CALL apoc.meta.relTypes() YIELD relType RETURN relType").flatten
      == Seq("KNOWS"))
    val card = rows(
      """CALL apoc.meta.cardinality('Person', 'KNOWS', 'Person')
         YIELD startCount, relCount, endCount RETURN startCount, relCount, endCount""").head
    assert(card == Seq(2L, 1L, 2L))
    val an = rows("""CALL apoc.meta.analyze() YIELD nodeCount, relCount, labelCount
                     RETURN nodeCount, relCount, labelCount""").head
    assert(an == Seq(2L, 1L, 1L))
    assert(rows("CALL apoc.meta.pattern('(Person)-[:KNOWS]->(Person)') YIELD count RETURN count")
      .head == Seq(1L))
    // export → validate round trip
    val js = rows("CALL apoc.meta.export() YIELD value RETURN value").head.head.toString
    assert(js.contains("\"labels\":[\"Person\"]"))
    assert(rows(s"CALL apoc.meta.validate('${js}') YIELD valid RETURN valid").head == Seq(true))
  }

  test("meta type scalars") {
    val r = rows(
      """MATCH (a:Person {key: 1})-[r:KNOWS]->(b)
         RETURN apoc.meta.type('x') AS ts, apoc.meta.type(1) AS ti,
                apoc.meta.type(1.5) AS tf, apoc.meta.type(true) AS tb,
                apoc.meta.type([1]) AS tl, apoc.meta.type(a) AS tn,
                apoc.meta.type(r) AS tr,
                apoc.meta.isType(1, 'INTEGER') AS it,
                apoc.meta.isNode(a) AS isn,
                apoc.meta.typeOf('x')['type'] AS to""").head
    assert(r == Seq("STRING", "INTEGER", "FLOAT", "BOOLEAN", "LIST",
      "NODE", "RELATIONSHIP", true, true, "STRING"))
  }

  test("schema catalog: DDL procedures + observed shapes") {
    rows("CALL apoc.schema.createIndex('Person', 'name') YIELD created RETURN created")
    assert(rows("""CALL apoc.schema.nodeIndexExists('Person', 'name') YIELD exists
                   RETURN exists""").head == Seq(true))
    assert(rows("CALL apoc.schema.nodeIndexes() YIELD label RETURN label").flatten
      .contains("Person"))
    rows("CALL apoc.schema.dropIndex('Person', 'name') YIELD dropped RETURN dropped")
    assert(rows("""CALL apoc.schema.nodeIndexExists('Person', 'name') YIELD exists
                   RETURN exists""").head == Seq(false))
    // assert(): declarative — creates the wanted index, reports counts
    assert(rows("""CALL apoc.schema.assert('{"Person": ["key"]}', '{}')
                   YIELD indexes RETURN indexes""").head == Seq(1L))
    val shapes = rows("CALL apoc.schema.nodes() YIELD label, properties RETURN label, properties")
    assert(shapes.map(_.head) == Seq("Person"))
    assert(rows("CALL apoc.schema.labels() YIELD label RETURN label").flatten == Seq("Person"))
  }

  test("log ring: append, tail, search, level, stats") {
    rows("CALL apoc.log.clear() YIELD cleared RETURN cleared")
    rows("CALL apoc.log.info('hello world') YIELD seq RETURN seq")
    rows("CALL apoc.log.warn('watch out') YIELD seq RETURN seq")
    rows("CALL apoc.log.error('boom') YIELD seq RETURN seq")
    assert(rows("CALL apoc.log.tail(2) YIELD message RETURN message").flatten
      == Seq("watch out", "boom"))
    assert(rows("CALL apoc.log.search('hello') YIELD message RETURN message").flatten
      == Seq("hello world"))
    assert(rows("CALL apoc.log.stats() YIELD level, n RETURN level, n")
      .map(_.head).toSet == Set("INFO", "WARN", "ERROR"))
    rows("CALL apoc.log.setLevel('DEBUG') YIELD level RETURN level")
    assert(rows("CALL apoc.log.getLevel() YIELD level RETURN level").head == Seq("DEBUG"))
  }

  test("advisory locks") {
    rows("CALL apoc.lock.unlockAll() YIELD released RETURN released")
    assert(rows("CALL apoc.lock.tryLock('n1') YIELD acquired RETURN acquired").head
      == Seq(true))
    assert(rows("CALL apoc.lock.isLocked('n1') YIELD locked RETURN locked").head
      == Seq(true))
    assert(rows("CALL apoc.lock.stats() YIELD held RETURN held").head == Seq(1L))
    assert(rows("CALL apoc.lock.detectDeadlock() YIELD deadlock RETURN deadlock").head
      == Seq(false))
    rows("CALL apoc.lock.unlockAll() YIELD released RETURN released")
    assert(rows("CALL apoc.lock.isLocked('n1') YIELD locked RETURN locked").head
      == Seq(false))
  }

  test("triggers fire after writes, honor disable/remove") {
    store // force init
    rows("""CALL apoc.trigger.add('audit', 'MERGE (c:Counter {key: 99}) ON CREATE SET c.n = 1 ON MATCH SET c.n = 3')
            YIELD installed RETURN installed""")
    // this write fires the trigger once → Counter created with n = 1
    CypherWrite.execute(store, "CREATE (x:Person {key: 10, name: 'Tmp'})")
    assert(Cypher.run(store.snapshot,
      "MATCH (c:Counter) RETURN c.n AS n").collect().head.get(0).toString == "1")
    // second write re-fires → ON MATCH SET n = 3
    CypherWrite.execute(store, "CREATE (x:Person {key: 11, name: 'Tmp2'})")
    assert(Cypher.run(store.snapshot,
      "MATCH (c:Counter) RETURN c.n AS n").collect().head.get(0).toString == "3")
    assert(rows("CALL apoc.trigger.isEnabled('audit') YIELD enabled RETURN enabled").head
      == Seq(true))
    rows("CALL apoc.trigger.disable('audit') YIELD found RETURN found")
    assert(rows("CALL apoc.trigger.isEnabled('audit') YIELD enabled RETURN enabled").head
      == Seq(false))
    assert(rows("CALL apoc.trigger.remove('audit') YIELD removed RETURN removed").head
      == Seq(true))
    assert(rows("CALL apoc.trigger.count() YIELD count RETURN count").head == Seq(0L))
  }

  test("periodic jobs: submit, list, cancel, commit-until-quiet, truncate guard") {
    rows("""CALL apoc.periodic.submit('mk', 'MERGE (j:Job {key: 7})')
            YIELD executions RETURN executions""")
    assert(Cypher.run(store.snapshot, "MATCH (j:Job) RETURN count(*) AS n")
      .collect().head.getLong(0) == 1L)
    assert(rows("CALL apoc.periodic.list() YIELD name, executions RETURN name, executions")
      .exists(r => r.head == "mk"))
    assert(rows("CALL apoc.periodic.cancel('mk') YIELD cancelled RETURN cancelled").head
      == Seq(true))
    // commit: first pass deletes the Job node, second pass writes nothing
    val c = rows("""CALL apoc.periodic.commit('MATCH (j:Job) DETACH DELETE j')
                    YIELD passes, operations RETURN passes, operations""").head
    assert(c == Seq(2L, 1L))
  }

  test("apoc.cypher meta-procedures") {
    assert(rows("""CALL apoc.cypher.runFirstColumn('MATCH (p:Person) RETURN p.name AS n ORDER BY n')
                   YIELD value RETURN value""").flatten.take(2) == Seq("Alice", "Bob"))
    assert(rows("""CALL apoc.cypher.validate('MATCH (n) RETURN n') YIELD valid RETURN valid""").head
      == Seq(true))
    assert(rows("""CALL apoc.cypher.validate('MATCH (((') YIELD valid RETURN valid""").head
      == Seq(false))
    val js = rows("""CALL apoc.cypher.toJson('MATCH (p:Person {key: 1}) RETURN p.name AS name')
                     YIELD json RETURN json""").head.head.toString
    assert(js.contains("\"name\":\"Alice\""))
    val mp = rows("""CALL apoc.cypher.toMap('MATCH (p:Person) WHERE p.key <= 2 RETURN p.name AS k, p.key AS v')
                     YIELD map RETURN map""").head.head.asInstanceOf[Map[String, Any]]
    assert(mp.keySet == Set("Alice", "Bob"))
    val st = rows("""CALL apoc.cypher.doIt('CREATE (t:Tag {key: 1})')
                     YIELD nodesCreated RETURN nodesCreated""").head
    assert(st == Seq(1L))
  }

  test("atomic property updates") {
    assert(rows("CALL apoc.atomic.add('Person:1', 'score', 5) YIELD value RETURN value").head
      == Seq("15"))
    assert(rows("CALL apoc.atomic.increment('Person:1', 'score') YIELD value RETURN value").head
      == Seq("16"))
    assert(rows("CALL apoc.atomic.subtract('Person:1', 'score', 6) YIELD value RETURN value").head
      == Seq("10"))
    assert(rows("CALL apoc.atomic.concat('Person:1', 'name', '!') YIELD value RETURN value").head
      == Seq("Alice!"))
    assert(rows("""CALL apoc.atomic.compareAndSwap('Person:1', 'score', '10', '42')
                   YIELD swapped RETURN swapped""").head == Seq(true))
    assert(rows("""CALL apoc.atomic.compareAndSwap('Person:1', 'score', '10', '0')
                   YIELD swapped RETURN swapped""").head == Seq(false))
    assert(rows("CALL apoc.atomic.insert('Person:1', 'tags', 0, 'x') YIELD value RETURN value").head
      == Seq("""["x"]"""))
    assert(rows("CALL apoc.atomic.insert('Person:1', 'tags', 1, 'y') YIELD value RETURN value").head
      == Seq("""["x","y"]"""))
    assert(rows("CALL apoc.atomic.remove('Person:1', 'tags', 0) YIELD value RETURN value").head
      == Seq("""["y"]"""))
  }

  test("apoc.search family over the person store") {
    // the atomic-concat test has renamed Alice → 'Alice!' by this point
    assert(rows("""CALL apoc.search.node('Person', 'name', 'Alice!') YIELD id RETURN id""")
      .flatten == Seq("Person:1"))
    assert(rows("""CALL apoc.search.fuzzy('Person', 'name', 'alise', 2) YIELD id RETURN id""")
      .flatten == Seq("Person:1"))
    assert(rows("""CALL apoc.search.prefix('Person', 'name', 'Bo') YIELD value RETURN value""")
      .flatten == Seq("Bob"))
    assert(rows("""CALL apoc.search.fullText('Person', 'name', 'nope alice') YIELD id RETURN id""")
      .flatten == Seq("Person:1"))
    assert(rows("""CALL apoc.search.regex('Person', 'name', 'A.*e') YIELD id RETURN id""")
      .flatten == Seq("Person:1"))
    assert(rows("""CALL apoc.search.exists('Person', 'score') YIELD id RETURN id""")
      .flatten == Seq("Person:1"))
    assert(rows("""CALL apoc.search.missing('Person', 'score') YIELD id RETURN count(*) AS n""")
      .head.head.asInstanceOf[Long] >= 1L)
    assert(rows("""CALL apoc.search.suggest('Person', 'name', 'Al', 5) YIELD value RETURN value""")
      .flatten == Seq("Alice!")) // concat test appended '!'
    val sc = rows("""CALL apoc.search.score('Person', 'name', 'alice bob') YIELD id, score
                     RETURN id, score ORDER BY id""")
    assert(sc.forall(_(1) == 1))
    assert(rows("""MATCH (p:Person {key: 2})
                   RETURN apoc.search.highlight(p.name, 'bo', '<b>', '</b>') AS h""")
      .head == Seq("<b>Bo</b>b"))
  }

  test("warmup caching surface") {
    val w = rows("CALL apoc.warmup.run() YIELD nodesLoaded, relsLoaded RETURN nodesLoaded, relsLoaded").head
    assert(w(0).asInstanceOf[Long] >= 2L)
    assert(rows("CALL apoc.warmup.status() YIELD nodesCached RETURN nodesCached").head
      == Seq(true))
  }
}
