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

  test("database catalog: create/drop/alias/composite management + routing") {
    import graft.cypher.DatabaseCatalog
    val g = GraphQueries.graph(spark, sf)
    val cat = new DatabaseCatalog(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)))
    cat.execute("CREATE DATABASE tenant_a")
    cat.execute("CREATE DATABASE tenant_a IF NOT EXISTS") // idempotent
    intercept[IllegalArgumentException] { cat.execute("CREATE DATABASE tenant_a") }
    cat.execute("CREATE DATABASE tenant_b")
    // writes route per database and stay isolated
    CypherWrite.execute(cat.store("tenant_a"),
      "CREATE (x:T {key: 1, name: 'a1'}), (y:T {key: 2, name: 'a2'})")
    CypherWrite.execute(cat.store("tenant_b"), "CREATE (x:T {key: 9, name: 'b1'})")
    assert(cat.run("USE tenant_a MATCH (n:T) RETURN count(*) AS n")
      .collect().head.getLong(0) == 2L)
    // alias routes to its database
    cat.execute("CREATE ALIAS prod FOR DATABASE tenant_b")
    assert(cat.run("USE prod MATCH (n:T) RETURN count(*) AS n")
      .collect().head.getLong(0) == 1L)
    val al = cat.execute("SHOW ALIASES").collect()
    assert(al.length == 1 && al.head.getString(0) == "prod"
      && al.head.getString(1) == "tenant_b")
    // composite = union of constituents
    cat.execute("""CREATE COMPOSITE DATABASE analytics
      ALIAS ta FOR DATABASE tenant_a ALIAS tb FOR DATABASE tenant_b""")
    assert(cat.run("USE analytics MATCH (n:T) RETURN count(*) AS n")
      .collect().head.getLong(0) == 3L)
    val cons = cat.execute("SHOW CONSTITUENTS FOR COMPOSITE DATABASE analytics")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cons == Seq(("ta", "tenant_a"), ("tb", "tenant_b")))
    // ALTER drops a constituent; SHOW DATABASES carries both kinds
    cat.execute("ALTER COMPOSITE DATABASE analytics DROP ALIAS ta")
    assert(cat.run("USE analytics MATCH (n:T) RETURN count(*) AS n")
      .collect().head.getLong(0) == 1L)
    val names = cat.execute("SHOW DATABASES")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(names == Map("neo4j" -> "standard", "tenant_a" -> "standard",
      "tenant_b" -> "standard", "analytics" -> "composite"))
    // dropping a database cascades out of aliases; default is protected
    cat.execute("DROP DATABASE tenant_b")
    assert(cat.execute("SHOW ALIASES").count() == 0)
    intercept[IllegalArgumentException] { cat.execute("DROP DATABASE neo4j") }
    intercept[IllegalArgumentException] { cat.execute("DROP DATABASE nope") }
    cat.execute("DROP DATABASE nope IF EXISTS") // no error
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

  test("persist writes a snapshot that a fresh store loads back identically") {
    val s = new GraphStore(GraphQueries.graph(spark, sf), registerGlobal = false)
    CypherWrite.execute(s, "CREATE (a:Persisted {key: 424242, name: 'Durable'})")
    s.setNodeVectorProperty("Customer:1", "emb", Seq(0.1, 0.2, 0.3))
    val dir = java.nio.file.Files.createTempDirectory("graft-persist").toString
    s.persist(dir)
    val re = GraphStore.load(spark, dir, registerGlobal = false)
    assert(re.snapshot.nodes.count() == s.snapshot.nodes.count())
    assert(re.snapshot.edges.count() == s.snapshot.edges.count())
    def idHash(st: GraphStore): Long = st.snapshot.nodes
      .agg(expr("bit_xor(xxhash64(id))")).collect()(0).getLong(0)
    assert(idHash(re) == idHash(s))
    assert(re.snapshot.nodes.filter(array_contains(col("labels"), "Persisted"))
      .count() == 1)
    assert(re.nodeEmbeddings.collect().map(r =>
      (r.getString(0), r.getString(1), r.getSeq[Double](2))).toSet ==
      Set(("Customer:1", "emb", Seq(0.1, 0.2, 0.3))))
  }
}
