package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.{CypherDdl, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Schema DDL (catalog + enforced unique constraints) and explicit
  * optimistic transactions over the snapshot store.
  */
class DdlTxSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
  }

  test("DDL lifecycle: create, show, drop; duplicate names rejected") {
    val s = freshStore()
    CypherDdl.tryExecute(s, "CREATE INDEX i1 FOR (n:Person) ON (n.name)")
    CypherDdl.tryExecute(s, "CREATE VECTOR INDEX i2 FOR (n:Person) ON (n.emb)")
    assert(CypherDdl.tryExecute(s, "SHOW INDEXES").get.count() == 2)
    intercept[IllegalArgumentException] {
      CypherDdl.tryExecute(s, "CREATE INDEX i1 FOR (n:Person) ON (n.key)")
    }
    CypherDdl.tryExecute(s, "DROP INDEX i2")
    assert(CypherDdl.tryExecute(s, "SHOW INDEXES").get.count() == 1)
    assert(CypherDdl.tryExecute(s, "MATCH (n) RETURN n").isEmpty) // not DDL
  }

  test("unique constraint is enforced on CREATE") {
    val s = freshStore()
    CypherDdl.tryExecute(s,
      "CREATE CONSTRAINT uname FOR (n:Person) REQUIRE n.name IS UNIQUE")
    CypherWrite.execute(s, "CREATE (a:Person {key: 1, name: 'Alice'})")
    intercept[IllegalArgumentException] {
      CypherWrite.execute(s, "CREATE (b:Person {key: 2, name: 'Alice'})")
    }
    // different value passes; store unchanged by the failed statement
    CypherWrite.execute(s, "CREATE (c:Person {key: 3, name: 'Cara'})")
    assert(s.snapshot.nodes.count() == 2)
  }

  test("transaction commits atomically") {
    val s = freshStore()
    s.transaction { tx =>
      CypherWrite.execute(tx, "CREATE (a:Person {key: 1, name: 'A'})")
      CypherWrite.execute(tx, "CREATE (b:Person {key: 2, name: 'B'})")
      // outer store sees nothing mid-transaction
      assert(s.snapshot.nodes.count() == 0)
    }
    assert(s.snapshot.nodes.count() == 2)
  }

  test("transaction rolls back on exception") {
    val s = freshStore()
    intercept[RuntimeException] {
      s.transaction { tx =>
        CypherWrite.execute(tx, "CREATE (a:Person {key: 1, name: 'A'})")
        sys.error("boom")
      }
    }
    assert(s.snapshot.nodes.count() == 0)
  }

  test("CALL {} IN TRANSACTIONS batches the write body over driving rows") {
    val s = freshStore()
    CypherWrite.execute(s,
      "UNWIND [1, 2, 3, 4, 5] AS k CREATE (p:Person {key: k, name: 'P'})")
    CypherWrite.execute(s,
      """MATCH (p:Person)
         CALL { WITH p SET p.acctbal = 42 } IN TRANSACTIONS OF 2 ROWS""")
    val bals = s.snapshot.nodes.collect().map(_.getAs[Double]("acctbal")).toSeq
    assert(bals.size == 5 && bals.forall(_ == 42.0))
  }

  test("periodicIterate applies the inner statement in batches") {
    val s = freshStore()
    CypherWrite.execute(s,
      "UNWIND [1, 2, 3, 4, 5, 6, 7] AS k CREATE (p:Person {key: k, name: 'P'})")
    val (batches, total, ops) = CypherWrite.periodicIterate(s,
      "MATCH (p:Person) RETURN p", "SET p.mktsegment = 'DONE'", 3)
    assert(batches == 3 && total == 7 && ops == 7)
    assert(s.snapshot.nodes.filter(col("mktsegment") === "DONE").count() == 7)
  }

  test("transaction conflict: first committer wins") {
    val s = freshStore()
    intercept[IllegalArgumentException] {
      s.transaction { tx =>
        CypherWrite.execute(tx, "CREATE (a:Person {key: 1, name: 'A'})")
        // a concurrent writer commits directly to the base store
        CypherWrite.execute(s, "CREATE (x:Person {key: 9, name: 'X'})")
      }
    }
    // only the concurrent write survives
    assert(s.snapshot.nodes.collect().map(_.getAs[String]("name")).toSeq == Seq("X"))
  }
}
