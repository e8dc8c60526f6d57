package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.AtomicReference
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.GraphQlServer

/** Round-9: GraphQL subscriptions over SSE (schema.graphql:1174-1208) and
  * the standard @skip/@include directives (spec §3.13).
  */
class Round9SubscriptionSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, body: String): String =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/graphql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def emptyStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
  }

  test("@skip and @include drop or keep fields by literal and variable") {
    val server = new GraphQlServer(emptyStore()).start()
    try {
      val p = server.boundPort
      val lit = post(p,
        "query { labels @skip(if: true) relationshipTypes @include(if: true) }")
      assert(!lit.contains("\"labels\"") && lit.contains("\"relationshipTypes\""), lit)
      val byVar = post(p,
        """{"query":"query Q($v: Boolean!) { labels @include(if: $v) stats @skip(if: $v) { nodeCount } }","variables":{"v":false}}""")
      assert(!byVar.contains("\"labels\"") && byVar.contains("\"nodeCount\""), byVar)
      // unknown directive → error, not silent pass-through
      val bad = post(p, "query { labels @defer }")
      assert(bad.contains("errors") && bad.contains("unsupported directive"), bad)
    } finally server.stop()
  }

  test("subscription receives commit events from another connection") {
    val store = emptyStore()
    val server = new GraphQlServer(store).start()
    try {
      val p = server.boundPort
      val firstEvent = new AtomicReference[String](null)
      val connected = new CountDownLatch(1)
      val reader = new Thread(() => {
        val resp = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p/graphql"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """subscription { nodeCreated(labels: ["Item"]) { id labels } }"""))
          .build(), HttpResponse.BodyHandlers.ofInputStream())
        assert(resp.headers().firstValue("Content-Type")
          .orElse("").startsWith("text/event-stream"))
        connected.countDown()
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(resp.body(), "UTF-8"))
        var line = br.readLine()
        while (line != null && firstEvent.get() == null) {
          if (line.startsWith("data: ")) firstEvent.set(line.substring(6))
          line = br.readLine()
        }
      }, "sse-reader")
      reader.setDaemon(true)
      reader.start()
      assert(connected.await(15, java.util.concurrent.TimeUnit.SECONDS),
        "subscription never connected")

      // commit mutations on other connections until the event lands (the
      // listener registers shortly after the SSE headers arrive)
      var k = 0
      while (firstEvent.get() == null && k < 20) {
        k += 1
        post(p, s"""mutation { createNode(input: {labels: ["Item"], properties: {key: "$k"}}) { id } }""")
        // a non-matching label must NOT satisfy the filter
        post(p, s"""mutation { createNode(input: {labels: ["Other"], properties: {key: "${1000 + k}"}}) { id } }""")
        Thread.sleep(250)
      }
      val ev = firstEvent.get()
      assert(ev != null, "no subscription event within the retry window")
      assert(ev.contains("\"id\":\"Item:") && ev.contains("\"labels\":[\"Item\"]"), ev)
    } finally server.stop()
  }

  test("searchStream subscription streams hits then completes") {
    val store = emptyStore()
    Seq("graph vector search", "vector index", "plain prose").zipWithIndex
      .foreach { case (n, i) =>
        graft.cypher.CypherWrite.execute(store,
          s"CREATE (d:Doc {key: ${i + 1}, name: '$n'})")
      }
    val server = new GraphQlServer(store).start()
    try {
      val resp = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/graphql"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """subscription { searchStream(query: "vector search", options: {limit: 2, method: "BM25"}) }"""))
        .build(), HttpResponse.BodyHandlers.ofInputStream())
      assert(resp.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/event-stream"))
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(resp.body(), "UTF-8"))
      val events = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var evName: String = null
      var line = br.readLine()
      while (line != null && !events.exists(_._1 == "complete")) {
        if (line.startsWith("event: ")) evName = line.substring(7)
        else if (line.startsWith("data: ")) events += (evName -> line.substring(6))
        line = br.readLine()
      }
      val hits = events.filter(_._1 == "searchStream")
      assert(hits.nonEmpty && hits.size <= 2, events.toString)
      assert(hits.forall(_._2.contains("\"id\":\"Doc:")), hits.toString)
      assert(events.last._1 == "complete")
    } finally server.stop()
  }
}
