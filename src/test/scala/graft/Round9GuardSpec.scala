package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.QueryGuard
import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.HttpTxServer

/** Round-9: query guardrails (enforcement.go:381-495 +
  * executor.go:561-591) — per-DB concurrent-query limit, query rate
  * limit, statement timeout; enforced in one shared guard the server
  * loops call, with the reference's refusal shapes.
  */
class Round9GuardSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  test("concurrent-query limit refuses the second statement and recovers") {
    QueryGuard.install("guard_cc", QueryGuard.Limits(maxConcurrentQueries = 1))
    try {
      val entered = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val holder = new Thread(() =>
        QueryGuard.guarded("guard_cc") { entered.countDown(); release.await() })
      holder.start()
      assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))
      val e = intercept[QueryGuard.LimitExceeded] {
        QueryGuard.guarded("guard_cc") { fail("must not run") }
      }
      assert(e.getMessage.contains("max_concurrent_queries") &&
        e.getMessage.contains("guard_cc") && e.getMessage.contains("1/1"),
        e.getMessage)
      release.countDown()
      holder.join(5000)
      // slot freed → next statement admitted
      assert(QueryGuard.guarded("guard_cc") { 42 } == 42)
    } finally QueryGuard.uninstall("guard_cc")
  }

  test("rate limit over HTTP-tx: saturation refused with ResourceExhausted, then recovery") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    QueryGuard.install("guarded_db", QueryGuard.Limits(maxQueriesPerSecond = 2))
    val server = new HttpTxServer(store).start()
    try {
      def run(): String = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/db/guarded_db/tx/commit"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"statements":[{"statement":"RETURN 1 AS one"}]}"""))
        .build(), HttpResponse.BodyHandlers.ofString()).body()
      // rapid-fire well past the bucket (requests may take long enough to
      // refill a token, so assert the refusal exists, not an exact count)
      val bodies = (1 to 8).map(_ => run())
      assert(bodies.take(2).forall(_.contains("\"row\":[1]")),
        "the first two statements (full bucket) must pass")
      val refused = bodies.filter(_.contains("ResourceExhausted"))
      assert(refused.nonEmpty &&
        refused.forall(_.contains("max_queries_per_second")), bodies.mkString("\n"))
      // bucket refills after a second → recovery
      Thread.sleep(1100)
      assert(run().contains("\"row\":[1]"))
    } finally {
      server.stop()
      QueryGuard.uninstall("guarded_db")
    }
  }

  test("storage limits refuse creates past max_nodes/max_edges, reference shape") {
    import graft.cypher.CypherWrite
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    store.setStorageLimits(maxNodes = 3, maxEdges = 1, db = "capped")
    CypherWrite.execute(store,
      "UNWIND [1, 2, 3] AS k CREATE (p:P {key: k})")
    assert(store.snapshot.nodes.count() == 3)
    val e = intercept[Exception] {
      CypherWrite.execute(store, "CREATE (p:P {key: 4})")
    }
    assert(e.getMessage.contains("max_nodes limit (3/3)") &&
      e.getMessage.contains("capped"), e.getMessage)
    assert(store.snapshot.nodes.count() == 3) // nothing committed
    // edges: the first link lands, the second trips max_edges
    CypherWrite.execute(store,
      "MATCH (a:P {key: 1}), (b:P {key: 2}) CREATE (a)-[:L]->(b)")
    val e2 = intercept[Exception] {
      CypherWrite.execute(store,
        "MATCH (a:P {key: 2}), (b:P {key: 3}) CREATE (a)-[:L]->(b)")
    }
    assert(e2.getMessage.contains("max_edges limit (1/1)"), e2.getMessage)
    // lifting the limits lets writes through again
    store.setStorageLimits()
    CypherWrite.execute(store, "CREATE (p:P {key: 4})")
    assert(store.snapshot.nodes.count() == 4)
  }

  test("statement timeout cancels the Spark job group and reports max_query_time") {
    QueryGuard.install("guard_to", QueryGuard.Limits(maxQueryTimeMs = 400))
    try {
      import spark.implicits._
      val t0 = System.nanoTime()
      val e = intercept[QueryGuard.LimitExceeded] {
        QueryGuard.guarded("guard_to") {
          // ~20s of executor sleep without cancellation
          spark.range(0, 64, 1, 32).mapPartitions { it =>
            Thread.sleep(10000); it
          }.count()
        }
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(e.getMessage.contains("max_query_time") &&
        e.getMessage.contains("guard_to"), e.getMessage)
      // the job group cancel interrupted the executors — nowhere near 10s
      assert(secs < 8.0, s"timeout did not cancel the job (took ${secs}s)")
      // guard releases cleanly: next statement runs
      assert(QueryGuard.guarded("guard_to") { spark.range(10).count() } == 10L)
    } finally QueryGuard.uninstall("guard_to")
  }
}
