package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** apoc create/merge/refactor/nodes write + collection families (wave 4).
  * One shared store mutated in test order — each block asserts the state
  * it produced.
  */
class ApocWriteSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store: GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val s = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    CypherWrite.execute(s,
      """CREATE (a:Person {key: 1, name: 'A', status: 'yes'}),
              (b:Person {key: 2, name: 'B', status: 'no'}),
              (c:Person {key: 3, name: 'C'})""")
    CypherWrite.execute(s,
      "MATCH (a:Person {key: 1}) MATCH (b:Person {key: 2}) CREATE (a)-[:KNOWS]->(b)")
    s
  }

  private def rows(q: String): Seq[Seq[Any]] =
    Cypher.run(store.snapshot, q).collect().map(_.toSeq.toSeq).toSeq

  test("create: node, relationship, clone, uuids") {
    store // init
    assert(rows("""CALL apoc.create.node('Widget:9', 'Widget', '{"name": "w9"}')
                   YIELD nodesCreated RETURN nodesCreated""").head == Seq(1L))
    assert(rows("MATCH (w:Widget) RETURN w.name AS n").flatten == Seq("w9"))
    assert(rows("""CALL apoc.create.relationship('Person:1', 'OWNS', '{}', 'Widget:9')
                   YIELD relationshipsCreated RETURN relationshipsCreated""").head == Seq(1L))
    assert(rows("MATCH (:Person)-[r:OWNS]->(:Widget) RETURN count(*) AS n").head == Seq(1L))
    rows("CALL apoc.create.clone('Widget:9', 'Widget:10') YIELD nodesCreated RETURN nodesCreated")
    assert(rows("MATCH (w:Widget) RETURN count(*) AS n").head == Seq(2L))
    assert(rows("CALL apoc.create.uuids(3) YIELD uuid RETURN count(*) AS n").head == Seq(3L))
    rows("""CALL apoc.create.cloneSubgraph('Person:1,Widget:9', '_c')
            YIELD nodesCreated RETURN nodesCreated""")
    assert(rows("MATCH (n) WHERE n.id ENDS WITH '_c' RETURN count(*) AS n").head == Seq(2L))
  }

  test("merge: idempotent node and relationship") {
    // the engine's MERGE derives deterministic ids from `key`
    val first = rows("""CALL apoc.merge.node('Team', '{"key": 77, "name": "core"}')
                        YIELD nodesCreated RETURN nodesCreated""").head
    val second = rows("""CALL apoc.merge.node('Team', '{"key": 77, "name": "core"}')
                         YIELD nodesCreated RETURN nodesCreated""").head
    assert(first == Seq(1L) && second == Seq(0L))
    val r1 = rows("""CALL apoc.merge.relationship('Person:1', 'IN', 'Person:2')
                     YIELD relationshipsCreated RETURN relationshipsCreated""").head
    val r2 = rows("""CALL apoc.merge.relationship('Person:1', 'IN', 'Person:2')
                     YIELD relationshipsCreated RETURN relationshipsCreated""").head
    assert(r1 == Seq(1L) && r2 == Seq(0L))
  }

  test("refactor: renames, endpoint rewrites, mergeNodes, extract/collapse") {
    rows("CALL apoc.refactor.renameLabel('Widget', 'Gadget') YIELD updated RETURN updated")
    assert(rows("MATCH (w:Gadget) RETURN count(*) AS n").head.head.asInstanceOf[Long] >= 2L)
    rows("CALL apoc.refactor.renameType('OWNS', 'HAS') YIELD updated RETURN updated")
    // 2: the original OWNS edge plus its cloneSubgraph copy
    assert(rows("MATCH ()-[r:HAS]->() RETURN count(*) AS n").head == Seq(2L))
    rows("CALL apoc.refactor.renameProperty('status', 'state') YIELD updated RETURN updated")
    // filter by id: cloneSubgraph copied Person:1 with the same key
    assert(rows("MATCH (p:Person) WHERE p.id = 'Person:1' RETURN p.state AS s")
      .flatten == Seq("yes"))

    // invert a KNOWS edge, then redirect it
    val relId = rows("MATCH (:Person {key: 1})-[r:KNOWS]->(:Person {key: 2}) RETURN id(r) AS i")
      .head.head.toString
    rows(s"CALL apoc.refactor.invertRelationship('$relId') YIELD updated RETURN updated")
    assert(rows("MATCH (:Person {key: 2})-[r:KNOWS]->(:Person {key: 1}) RETURN count(*) AS n")
      .head == Seq(1L))
    rows(s"CALL apoc.refactor.to('$relId', 'Person:3') YIELD updated RETURN updated")
    assert(rows("MATCH (:Person {key: 2})-[r:KNOWS]->(:Person {key: 3}) RETURN count(*) AS n")
      .head == Seq(1L))

    // extract the KNOWS edge into a node, then collapse that node back
    rows(s"CALL apoc.refactor.extractNode('$relId', 'Link') YIELD nodeId RETURN nodeId")
    assert(rows("MATCH (l:Link) RETURN count(*) AS n").head == Seq(1L))
    assert(rows("MATCH (:Person {key: 2})-[:KNOWS]->(:Link)-[:KNOWS]->(:Person {key: 3}) RETURN count(*) AS n")
      .head == Seq(1L))
    rows(s"CALL apoc.refactor.collapseNode('Link:$relId', 'KNOWS') YIELD collapsed RETURN collapsed")
    assert(rows("MATCH (l:Link) RETURN count(*) AS n").head == Seq(0L))
    assert(rows("MATCH (:Person {key: 2})-[:KNOWS]->(:Person {key: 3}) RETURN count(*) AS n")
      .head == Seq(1L))

    // normalizeAsBoolean over the renamed 'state' property
    rows("""CALL apoc.refactor.normalizeAsBoolean('state', 'yes,y', 'no,n')
            YIELD normalized RETURN normalized""")
    assert(rows("MATCH (p:Person) WHERE p.id = 'Person:1' RETURN p.state AS s")
      .flatten == Seq("true"))
    assert(rows("MATCH (p:Person) WHERE p.id = 'Person:2' RETURN p.state AS s")
      .flatten == Seq("false"))

    // categorize: state value becomes a label
    rows("CALL apoc.refactor.categorizeProperty('state', 'S_') YIELD categorized RETURN categorized")
    assert(rows("MATCH (p:S_true) RETURN p.id AS i ORDER BY i").flatten
      == Seq("Person:1", "Person:1_c"))

    // mergeNodes: fold Person:3 into Person:2
    rows("CALL apoc.refactor.mergeNodes('Person:2,Person:3') YIELD nodesRemoved RETURN nodesRemoved")
    // Person:1, Person:2, and the Person:1_c clone remain
    assert(rows("MATCH (p:Person) RETURN count(*) AS n").head == Seq(3L))
  }

  test("nodes collection procedures") {
    assert(rows("CALL apoc.nodes.get('Person:1,Person:2') YIELD id RETURN id ORDER BY id")
      .flatten == Seq("Person:1", "Person:2"))
    assert(rows("CALL apoc.nodes.connected('Person:1,Person:2') YIELD value RETURN value")
      .head.head.isInstanceOf[Boolean])
    rows("CALL apoc.nodes.link('Person:1,Person:2', 'NEXT') YIELD relationshipsCreated RETURN relationshipsCreated")
    assert(rows("MATCH (:Person {key: 1})-[:NEXT]->(:Person {key: 2}) RETURN count(*) AS n")
      .head == Seq(1L))
    assert(rows("CALL apoc.nodes.union('a,b', 'b,c') YIELD id RETURN id").flatten
      == Seq("a", "b", "c"))
    assert(rows("CALL apoc.nodes.intersect('a,b', 'b,c') YIELD id RETURN id").flatten
      == Seq("b"))
    assert(rows("CALL apoc.nodes.difference('a,b', 'b,c') YIELD id RETURN id").flatten
      == Seq("a"))
    assert(rows("CALL apoc.nodes.distinctRels('Person:1,Person:2') YIELD rel_type RETURN rel_type")
      .flatten.contains("NEXT"))
    // group by the normalized boolean property
    val grp = rows("CALL apoc.nodes.group('state') YIELD value, ids RETURN value, ids ORDER BY value")
    assert(grp.map(_.head) == Seq("false", "true"))
    rows("CALL apoc.nodes.delete('Gadget:10', true) YIELD nodesDeleted RETURN nodesDeleted")
    assert(rows("MATCH (g:Gadget) RETURN count(*) AS n").head.head.asInstanceOf[Long] >= 1L)
  }
}
