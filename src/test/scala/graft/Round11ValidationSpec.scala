package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.{HttpTxServer, McpServer, QdrantGrpcServer, RequestValidation => RV}

/** Round 11: request-validation middleware
  * (`pkg/security/validation.go` + `middleware.go` + the 10 MB body
  * bound of `server.go:370`) applied to every HTTP surface BEFORE
  * handler dispatch: oversized bodies, wrong content types, malformed
  * token/URL params, and injection-shaped credentials are refused with
  * the reference's status codes, and valid traffic is untouched.
  */
class Round11ValidationSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def emptyStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
  }

  private def get(url: String, headers: (String, String)*): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(url: String, body: Array[Byte], ct: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", ct)
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("validator shapes: tokens, header values, SSRF urls") {
    // tokens (validation.go:34-48)
    assert(RV.validateToken("abc.DEF-123_~+/=").isEmpty)
    assert(RV.validateToken("").isDefined)
    assert(RV.validateToken("a" * (RV.MaxTokenLength + 1)).isDefined)
    assert(RV.validateToken("abc<script>").isDefined)
    assert(RV.validateToken("javascript:alert(1)").isDefined)
    assert(RV.validateToken("tok;drop table").isDefined)
    // header values (validation.go:162-170)
    assert(RV.validateHeaderValue("Bearer abc 123").isEmpty)
    assert(RV.validateHeaderValue("x" * (RV.MaxHeaderLength + 1)).isDefined)
    assert(RV.validateHeaderValue("evil\r\nInjected: yes").isDefined)
    // urls (validation.go:51-100): dev allows localhost, production refuses
    assert(RV.validateUrl("https://example.com/cb").isEmpty)
    assert(RV.validateUrl("ftp://example.com").isDefined)
    assert(RV.validateUrl("javascript:alert(1)").isDefined)
    assert(RV.validateUrl("http://x/" + "a" * RV.MaxUrlLength).isDefined)
    assert(RV.validateUrl("http://localhost:8080/x", isDevelopment = true).isEmpty)
    assert(RV.validateUrl("http://localhost:8080/x", isDevelopment = false).isDefined)
    assert(RV.validateUrl("http://10.0.0.8/x", isDevelopment = false).isDefined)
    assert(RV.validateUrl("http://plain.example.com/x",
      isDevelopment = false, allowHttp = false).isDefined)
  }

  test("HTTP tx server: oversized body 413, wrong content type 415, " +
      "malformed params refused, valid traffic untouched") {
    val server = new HttpTxServer(emptyStore()).start()
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"

      // wrong content type on a body-bearing route → 415 before dispatch
      val (ctS, ctB) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[]}""".getBytes, "application/xml")
      assert(ctS == 415 && ctB.contains("unsupported content type"), s"$ctS $ctB")

      // declared body over the 10 MB bound → 413
      val big = new Array[Byte]((RV.MaxBodyBytes + 1024).toInt)
      java.util.Arrays.fill(big, 'x'.toByte)
      val (bigS, bigB) = post(s"$base/db/neo4j/tx/commit", big, "application/json")
      assert(bigS == 413 && bigB.contains("exceeds limit"), s"$bigS $bigB")

      // malformed token param → 401; dangerous redirect param → 400
      val (tS, tB) = get(s"$base/health?token=abc%3Cscript%3E")
      assert(tS == 401 && tB.contains("invalid token parameter"), s"$tS $tB")
      val (rS, rB) = get(s"$base/health?redirect=javascript:alert(1)")
      assert(rS == 400 && rB.contains("invalid redirect parameter"), s"$rS $rB")

      // injection-shaped Authorization credential → 401 shape refusal
      val (aS, aB) = get(s"$base/health", "Authorization" -> "Bearer abc<script>")
      assert(aS == 401 && aB.contains("invalid authorization token"), s"$aS $aB")

      // oversized header value → 400
      val (hS, hB) = get(s"$base/health", "X-Big" -> ("v" * (RV.MaxHeaderLength + 1)))
      assert(hS == 400 && hB.contains("invalid header"), s"$hS $hB")

      // valid traffic flows through to the real handlers
      val (okS, okB) = get(s"$base/health")
      assert(okS == 200 && okB.contains("\"status\""), s"$okS $okB")
      val (qS, qB) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"RETURN 1 AS one"}]}""".getBytes,
        "application/json")
      assert(qS == 200 && qB.contains("\"one\""), s"$qS $qB")
    } finally server.stop()
  }

  test("MCP and Qdrant gRPC surfaces refuse wrong content types and " +
      "oversized bodies before dispatch") {
    val mcp = new McpServer(emptyStore()).start()
    try {
      val base = s"http://127.0.0.1:${mcp.boundPort}"
      val (s1, b1) = post(s"$base/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""".getBytes,
        "application/octet-stream")
      assert(s1 == 415 && b1.contains("unsupported content type"), s"$s1 $b1")
      val (s2, _) = post(s"$base/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""".getBytes,
        "application/json")
      assert(s2 == 200)
    } finally mcp.stop()

    val qd = new QdrantGrpcServer(() => spark.emptyDataFrame).start()
    try {
      val base = s"http://127.0.0.1:${qd.boundPort}"
      // text/html body against a gRPC-Web route → 415
      val (s3, b3) = post(s"$base/qdrant.Points/Count",
        Array[Byte](0, 0, 0, 0, 0), "text/html")
      assert(s3 == 415 && b3.contains("unsupported content type"), s"$s3 $b3")
    } finally qd.stop()
  }
}
