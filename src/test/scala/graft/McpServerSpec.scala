package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.McpServer

/** Integration: the MCP tool surface over real HTTP — JSON-RPC 2.0
  * initialize / tools/list / tools/call plus REST aliases, and the
  * store → recall → discover → link lifecycle
  * (`/root/reference/pkg/mcp/server.go`, `tools.go`).
  */
class McpServerSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val resp = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("JSON-RPC lifecycle: initialize, tools/list, store/recall/discover/link") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val server = new McpServer(store).start()
    try {
      val p = server.boundPort

      val (s0, b0) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
      assert(s0 == 200 && b0.contains("\"protocolVersion\"") && b0.contains("\"id\":1"))

      val (_, b1) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":2,"method":"tools/list","params":{}}""")
      Seq("store", "recall", "discover", "link").foreach(t =>
        assert(b1.contains(s""""name":"$t""""), t))

      // store two memories (content-hash ids are deterministic)
      val (_, b2) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"store","arguments":{"content":"PostgreSQL is our primary database","type":"decision","tags":["db","infra"]}}}""")
      assert(b2.contains("\"isError\":false"), b2)
      assert(b2.contains("Decision:"))
      val (_, b3) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":"store","arguments":{"content":"User prefers dark mode"}}}""")
      assert(b3.contains("Memory:"))

      // recall by type + tag filters
      val (_, b4) = post(p, "/mcp/tools/call",
        """{"name":"recall","arguments":{"type":["decision"],"tags":["db"]}}""")
      assert(b4.contains("count\\\":1"), b4)
      assert(b4.contains("Decision:"))
      val (_, b4b) = post(p, "/mcp/tools/call",
        """{"name":"recall","arguments":{"tags":["nope"]}}""")
      assert(b4b.contains("count\\\":0"))

      // discover: the exact stored sentence ranks its node first
      val (_, b5) = post(p, "/mcp/tools/call",
        """{"name":"discover","arguments":{"query":"PostgreSQL is our primary database","limit":1}}""")
      assert(b5.contains("Decision:"), b5)

      // link the two nodes, then confirm the edge exists
      val idRe = """(Decision|Memory):[0-9]+""".r
      val decId = idRe.findFirstIn(b2).get
      val memId = idRe.findFirstIn(b3).get
      val (_, b6) = post(p, "/mcp/tools/call",
        s"""{"name":"link","arguments":{"from":"$decId","to":"$memId"}}""")
      assert(b6.contains("created\\\":true"), b6)
      assert(store.snapshot.edges
        .filter(org.apache.spark.sql.functions.col("rel_type") === "RELATES_TO")
        .count() == 1L)

      // unknown tool → isError; unknown method → JSON-RPC error code
      val (_, b7) = post(p, "/mcp/tools/call", """{"name":"nope","arguments":{}}""")
      assert(b7.contains("\"isError\":true"))
      val (_, b8) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":9,"method":"bogus","params":{}}""")
      assert(b8.contains("-32601"))
    } finally server.stop()
  }
}
