package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{array, lit, udf}
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraphQueries, TestSpark}
import graft.functions.Embedder
import graft.graph.GraphStore
import graft.sources.ServerAuth.{Rbac, Role}

/** Round-10 ADVICE regressions: /db routes gated on PermRead (RBAC
  * bypass for no-access credentials), per-object statement parsing (no
  * cross-statement parameter leak), shared JSON unescaping on every auth
  * field read, MCP catalog behind PermRead, and compare-and-set on the
  * background embedding regeneration.
  */
class Round10AdviceSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()
  private val bs = "\\" // literal backslash, kept out of string literals

  private val rbac = Rbac(Map(
    "tok-admin" -> Role.Admin,
    "tok-viewer" -> Role.Viewer,
    "tok-none" -> Role.NoAccess))

  private def post(port: Int, path: String, body: String,
      bearer: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def get(port: Int, path: String, bearer: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def store(): GraphStore =
    new GraphStore(GraphQueries.graph(spark, sf), registerGlobal = false)

  // ============================== high: /db behind withAuth(PermRead) =====

  test("a no-access credential cannot read Cypher or database counts") {
    val server = new HttpTxServer(store(), rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // authenticated but role=none → 403 Forbidden, not results
      val (code, body) = post(p, "/db/neo4j/tx/commit",
        """{"statements":[{"statement":"MATCH (n) RETURN count(n) AS c"}]}""",
        Some("tok-none"))
      assert(code == 403, s"$code $body")
      assert(body.contains("Neo.ClientError.Security.Forbidden"), body)
      // database info (node/edge counts) equally gated
      val (codeInfo, bodyInfo) = get(p, "/db/neo4j", Some("tok-none"))
      assert(codeInfo == 403, s"$codeInfo $bodyInfo")
      // a JWT with an unknown roles claim resolves to no-access → same gate
      val secret = "jwt-secret-at-least-32-chars-long!!".getBytes("UTF-8")
      val weird = ServerAuth.mintJwt(secret, "ghost", Seq(Role.NoAccess))
      val jwtRbac = Rbac(Map("tok-admin" -> Role.Admin), Some(secret))
      val server2 = new HttpTxServer(store(), rbac = Some(jwtRbac)).start()
      try {
        val (c2, b2) = post(server2.boundPort, "/db/neo4j/tx/commit",
          """{"statements":[{"statement":"RETURN 1 AS x"}]}""", Some(weird))
        assert(c2 == 403, s"$c2 $b2")
      } finally server2.stop()
      // a viewer still reads
      val (okCode, okBody) = post(p, "/db/neo4j/tx/commit",
        """{"statements":[{"statement":"RETURN 1 AS x"}]}""", Some("tok-viewer"))
      assert(okCode == 200 && okBody.contains("\"x\""), s"$okCode $okBody")
    } finally server.stop()
  }

  // ===================== medium: per-object statement field binding ======

  test("parameters and includeStats never leak into the next statement") {
    val server = new HttpTxServer(store(), rbac = Some(rbac))
    // statement 1 serializes parameters + includeStats AFTER its
    // statement key (the common JSON order); statement 2 has neither
    val parsed = server.parseStatements(
      """{"statements":[
        {"statement":"RETURN $a AS x","parameters":{"a":7},"includeStats":true},
        {"statement":"RETURN 1 AS y"}
      ]}""")
    assert(parsed.size == 2)
    assert(parsed(0) == (("RETURN $a AS x", Map("a" -> 7L), true)))
    assert(parsed(1) == (("RETURN 1 AS y", Map.empty[String, Any], false)))
    // key order WITHIN an object doesn't matter either
    val reordered = server.parseStatements(
      """{"statements":[
        {"parameters":{"b":"z"},"statement":"RETURN $b AS x","includeStats":false},
        {"includeStats":true,"statement":"RETURN 2 AS y"}
      ]}""")
    assert(reordered(0) == (("RETURN $b AS x", Map("b" -> "z"), false)))
    assert(reordered(1) == (("RETURN 2 AS y", Map.empty[String, Any], true)))
    // statements nested braces in parameters don't bleed
    val escaped = server.parseStatements(
      s"""{"statements":[{"statement":"RETURN 'a${bs}${bs}nb' AS s","parameters":{}}]}""")
    assert(escaped.head._1 == s"RETURN 'a${bs}nb' AS s")
  }

  test("multi-statement execution binds each statement's own parameters") {
    val server = new HttpTxServer(store(), rbac = Some(rbac)).start()
    try {
      val (code, body) = post(server.boundPort, "/db/neo4j/tx/commit",
        """{"statements":[
          {"statement":"RETURN $v AS a","parameters":{"v":42},"includeStats":true},
          {"statement":"RETURN 7 AS b"}
        ]}""", Some("tok-admin"))
      assert(code == 200, s"$code $body")
      assert(body.contains("42") && body.contains("\"b\""), body)
      // exactly one stats block: the second statement didn't inherit
      assert("\"stats\"".r.findAllIn(body).size == 1, body)
    } finally server.stop()
  }

  // ================= low: shared unescaping JSON field extraction ========

  test("passwords with quotes and backslashes round-trip through /auth/token") {
    val auth = new Authenticator("jwt-secret-at-least-32-chars-long!!".getBytes("UTF-8"))
    val password = "pa" + "\"" + "ss" + bs + "word9" // pa"ss\word9
    assert(auth.createUser("quoter", password, Seq(Role.Viewer)).isRight)
    val server = new HttpTxServer(store(), rbac = Some(rbac),
      authenticator = Some(auth)).start()
    try {
      // JSON-escape the quote and backslash on the wire
      val wire = "pa" + bs + "\"" + "ss" + bs + bs + "word9"
      val (code, body) = post(server.boundPort, "/auth/token",
        s"""{"username":"quoter","password":"$wire","grant_type":"password"}""",
        None)
      assert(code == 200, s"$code $body")
      assert(body.contains("access_token"), body)
    } finally server.stop()
    // the shared helper itself unescapes all JSON escapes
    assert(ServerAuth.strField(s"""{"k":"a${bs}"b${bs}${bs}c${bs}u0041"}""", "k")
      .contains("a" + "\"" + "b" + bs + "cA"))
  }

  // ============================ low: MCP catalog behind PermRead ==========

  test("MCP initialize and tools/list refuse a no-access credential") {
    val mcp = new McpServer(store(), rbac = Some(rbac)).start()
    try {
      val p = mcp.boundPort
      val (c1, b1) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"initialize"}""", Some("tok-none"))
      assert(c1 == 403, s"$c1 $b1")
      val (c2, b2) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""", Some("tok-none"))
      assert(c2 == 403, s"$c2 $b2")
      // a viewer still enumerates the catalog
      val (c3, b3) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":3,"method":"tools/list"}""", Some("tok-viewer"))
      assert(c3 == 200 && b3.contains("recall"), s"$c3 $b3")
    } finally mcp.stop()
  }

  // ================== low: regenerate compare-and-set (already_active) ====

  /** Embedder whose column form blocks until released — makes the
    * regeneration window deterministic for the CAS check.
    */
  private object GateEmbedder extends Embedder {
    val dim = 4
    val started = new AtomicInteger(0)
    @volatile var release = false
    def embed(text: String): Seq[Double] = Seq(1d, 0d, 0d, 0d)
    def embedCol(spark: SparkSession, c: Column): Column = {
      started.incrementAndGet()
      val gate = udf { (s: String) =>
        val deadline = System.nanoTime() + 10_000_000_000L
        while (!release && System.nanoTime() < deadline) Thread.sleep(20)
        Array(1d, 0d, 0d, 0d)
      }
      gate(c)
    }
  }

  test("concurrent regenerate requests: second answers already_active") {
    val st = store()
    val server = new HttpTxServer(st, rbac = Some(rbac)).start()
    try {
      Embedder.withEmbedder(GateEmbedder) {
        val p = server.boundPort
        val (c1, b1) = post(p, "/nornicdb/embed/trigger?regenerate=true",
          "{}", Some("tok-admin"))
        assert(c1 == 202 && b1.contains("\"accepted\":true"), s"$c1 $b1")
        // wait until the background thread actually holds the flag
        val deadline = System.currentTimeMillis() + 8000
        while (GateEmbedder.started.get() == 0 &&
          System.currentTimeMillis() < deadline) Thread.sleep(20)
        val (c2, b2) = post(p, "/nornicdb/embed/trigger?regenerate=true",
          "{}", Some("tok-admin"))
        assert(c2 == 202 && b2.contains("\"already_active\":true"), s"$c2 $b2")
        GateEmbedder.release = true
        // flag clears once the run finishes → a later regenerate is accepted
        val end = System.currentTimeMillis() + 15000
        var cleared = false
        while (!cleared && System.currentTimeMillis() < end) {
          val (_, stats) = get(p, "/nornicdb/embed/stats", Some("tok-admin"))
          cleared = stats.contains("\"running\":false")
          if (!cleared) Thread.sleep(100)
        }
        assert(cleared, "regeneration never finished")
      }
    } finally server.stop()
  }
}
