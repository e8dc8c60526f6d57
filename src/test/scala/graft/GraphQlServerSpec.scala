package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphStore
import graft.sources.GraphQlServer

/** Integration: the thin GraphQL endpoint over real HTTP — the reference
  * schema's core Query fields (`schema.graphql:816-941`) against the
  * TPC-H-derived graph.
  */
class GraphQlServerSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, body: String): String =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/graphql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("core query fields resolve over HTTP") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(g, registerGlobal = false)
    val server = new GraphQlServer(store).start()
    try {
      val p = server.boundPort

      // raw GraphQL document body (no JSON envelope)
      val labels = post(p, "query Labels { labels }")
      assert(labels.contains("\"Customer\"") && labels.contains("\"Region\""))

      // JSON envelope + named operation + field selection
      val nodeResp = post(p,
        """{"query":"query One { node(id: \"Region:0\") { id labels } }"}""")
      assert(nodeResp.contains("\"id\":\"Region:0\""))
      assert(nodeResp.contains("\"labels\":[\"Region\"]"))
      assert(!nodeResp.contains("properties")) // selection respected

      val page = post(p,
        "query { nodesByLabel(label: \"Region\", limit: 2, offset: 1) { id } }")
      assert("\"id\":\"Region:".r.findAllIn(page).size == 2)

      val counts = post(p, "query { nodeCount(label: \"Region\") }")
      assert(counts.contains("\"nodeCount\":5"))

      val stats = post(p,
        "query { stats { nodeCount relationshipCount labels { label count } } }")
      assert(stats.contains("\"nodeCount\":"))
      assert(stats.contains("\"label\":\"Region\",\"count\":5"))

      val rels = post(p, "query { relationshipTypes }")
      assert(rels.contains("\"PLACED\""))

      // cypher pass-through
      val cy = post(p,
        """{"query":"query { cypher(input: {query: \"MATCH (r:Region) RETURN count(r) AS n\"}) { columns rows } }"}""")
      assert(cy.contains("\"columns\":[\"n\"]") && cy.contains("\"n\":5"))

      // multiple root fields in one document
      val multi = post(p, "query { labels relationshipTypes }")
      assert(multi.contains("\"labels\":[") && multi.contains("\"relationshipTypes\":["))

      // unsupported field → GraphQL errors envelope
      val bad = post(p, "query { bogusField }")
      assert(bad.contains("\"errors\"") && bad.contains("unsupported query field"))
    } finally server.stop()
  }
}
