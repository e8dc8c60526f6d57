package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.HttpTxServer

/** Integration: the Neo4j HTTP transaction API over a real TCP port
  * (`/root/reference/pkg/server/server_db.go:24,393,757`): implicit
  * tx/commit with reads, parameters, writes, multi-statement bodies, and
  * Neo4j's 200-with-errors semantics for bad statements.
  */
class HttpTxServerSpec extends AnyFunSuite {
  import TestSpark._

  private def post(port: Int, body: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/db/neo4j/tx/commit"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("tx/commit: read with parameters, write, error-in-body, multi-statement") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.localCheckpoint(true), g.edges.localCheckpoint(true)),
      registerGlobal = false)
    val server = new HttpTxServer(store).start()
    try {
      // read with a parameter
      val (s1, b1) = post(server.boundPort,
        """{"statements":[{"statement":"MATCH (c:Customer) WHERE c.key = $k RETURN c.name AS name","parameters":{"k":1}}]}""")
      assert(s1 == 200)
      assert(b1.contains(""""columns":["name"]"""))
      assert(b1.contains("Customer#000000001"))
      assert(b1.contains(""""errors":[]"""))

      // write through the same endpoint, then read it back
      val (s2, b2) = post(server.boundPort,
        """{"statements":[{"statement":"CREATE (x:HttpSpec {key: 777001, name: 'via-http'})"}]}""")
      assert(s2 == 200 && b2.contains(""""errors":[]"""))
      val (_, b3) = post(server.boundPort,
        """{"statements":[{"statement":"MATCH (x:HttpSpec) RETURN x.name AS nm"}]}""")
      assert(b3.contains("via-http"))

      // multi-statement body: both results come back in order
      val (_, b4) = post(server.boundPort,
        """{"statements":[{"statement":"RETURN 1 AS a"},{"statement":"RETURN 2 AS b"}]}""")
      assert(b4.indexOf(""""columns":["a"]""") >= 0)
      assert(b4.indexOf(""""columns":["b"]""") > b4.indexOf(""""columns":["a"]"""))

      // a broken statement: 200 OK with the error in the body (Neo4j
      // semantics, server_db.go:796-800)
      val (s5, b5) = post(server.boundPort,
        """{"statements":[{"statement":"THIS IS NOT CYPHER"}]}""")
      assert(s5 == 200)
      assert(b5.contains("Neo.ClientError.Statement.SyntaxError"))

      // wrong route → 404 envelope
      val client = HttpClient.newHttpClient()
      val bad = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/db/neo4j/nope"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 404)
    } finally server.stop()
  }

  test("Neo4j row format: arrays in column order, entity meta, includeStats") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.localCheckpoint(true), g.edges.localCheckpoint(true)),
      registerGlobal = false)
    val server = new HttpTxServer(store).start()
    try {
      // scalar row is an ARRAY in column order with null meta slots
      val (_, b1) = post(server.boundPort,
        """{"statements":[{"statement":"RETURN 1 AS a, 'x' AS b"}]}""")
      assert(b1.contains(""""row":[1,"x"]""") &&
        b1.contains(""""meta":[null,null]"""), b1)
      // a returned node becomes the elementId form (server_db.go:882-899)
      // with matching meta; the embedding vector property is filtered
      val (_, b2) = post(server.boundPort,
        """{"statements":[{"statement":"MATCH (n:Nation) WHERE n.key = 7 RETURN n"}]}""")
      assert(b2.contains(""""elementId":"4:nornicdb:Nation:7""""), b2)
      assert(b2.contains(""""type":"node","deleted":false"""), b2)
      assert(!b2.contains("\"id\":\"Nation:7\""), b2) // internal shape gone
      // hoisted property columns land in the properties map
      assert(b2.matches("""(?s).*"properties":\{[^}]*"name":"NATION_7".*"""), b2)
      // includeStats: write reports contains_updates, read an empty stats
      val (_, b3) = post(server.boundPort,
        """{"statements":[{"statement":"CREATE (x:StatSpec {key: 777002})","includeStats":true}]}""")
      assert(b3.contains(""""stats":{"contains_updates":true}"""), b3)
      val (_, b4) = post(server.boundPort,
        """{"statements":[{"statement":"RETURN 1 AS a","includeStats":true}]}""")
      assert(b4.contains(""""stats":{}"""), b4)
      // key order must not matter: includeStats BEFORE statement
      val (_, b4b) = post(server.boundPort,
        """{"statements":[{"includeStats":true,"statement":"RETURN 1 AS a"}]}""")
      assert(b4b.contains(""""stats":{}"""), b4b)
      val (_, b5) = post(server.boundPort,
        """{"statements":[{"statement":"RETURN 2 AS a"}]}""")
      assert(!b5.contains("\"stats\""), b5)
    } finally server.stop()
  }
}
