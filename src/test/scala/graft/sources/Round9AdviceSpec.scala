package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraphQueries, TestSpark}
import graft.graph.GraphStore

/** Round-9 ADVICE regressions: GraphQL string-escape decoding + label
  * validation, Bolt write-keyword sniffing inside string literals, and
  * corrupt-image decode fallback.
  */
class Round9AdviceSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()
  private val bs = "\\" // literal backslash, kept out of string literals

  private def post(port: Int, body: String): String =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/graphql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("GraphQL string literals decode standard escapes (n, t, uXXXX)") {
    val store = new GraphStore(GraphQueries.graph(spark, sf), registerGlobal = false)
    val server = new GraphQlServer(store).start()
    try {
      val p = server.boundPort
      // document carries a literal backslash-n and backslash-u0041 escape
      val lit = "a" + bs + "nb" + bs + "u0041"
      val resp = post(p,
        s"""mutation { createNode(input: {labels: ["EscDoc"], properties: {key: "e1", body: "$lit"}}) { id properties } }""")
      assert(!resp.contains("errors"), resp)
      // decoded newline round-trips as the JSON escape, u0041 as a real 'A'
      assert(resp.contains("a" + bs + "nb"), resp)
      assert(resp.contains("bA"), resp)
      // unknown escape is rejected, not silently mangled
      val badEsc = post(p,
        s"""mutation { createNode(input: {labels: ["EscDoc"], properties: {key: "e2", body: "x${bs}qz"}}) { id } }""")
      assert(badEsc.contains("errors") && badEsc.contains("unknown escape"), badEsc)
    } finally server.stop()
  }

  test("GraphQL labels are validated before pattern interpolation") {
    val store = new GraphStore(GraphQueries.graph(spark, sf), registerGlobal = false)
    val server = new GraphQlServer(store).start()
    try {
      val p = server.boundPort
      val before = store.snapshot.nodes.count()
      val inj = post(p,
        """mutation { createNode(input: {labels: ["X) DETACH DELETE (m"], properties: {key: "i1"}}) { id } }""")
      assert(inj.contains("errors") && inj.contains("invalid label"), inj)
      assert(store.snapshot.nodes.count() == before)
      val injMerge = post(p,
        """mutation { mergeNode(labels: ["Y) DETACH DELETE (m"], matchProperties: {key: "i2"}) { id } }""")
      assert(injMerge.contains("errors") && injMerge.contains("invalid label"), injMerge)
    } finally server.stop()
  }

  test("Bolt write sniff ignores keywords inside string literals") {
    // a read with a write keyword in a VALUE is not a write statement
    assert(!BoltServer.isWriteStatement(
      "MATCH (n) WHERE n.name = 'SET x' RETURN n"))
    assert(!BoltServer.isWriteStatement(
      "MATCH (n) WHERE n.q = \"please MERGE me\" RETURN n.name"))
    assert(!BoltServer.isWriteStatement(
      "RETURN 'CREATE (m:Evil)' AS s"))
    // escaped quote inside a literal does not end the literal early
    assert(!BoltServer.isWriteStatement(
      "RETURN 'it" + bs + "'s CREATE time' AS s"))
    // real writes still route to the write path
    assert(BoltServer.isWriteStatement("CREATE (n:Person {key: 1})"))
    assert(BoltServer.isWriteStatement(
      "MATCH (n {name: 'x'}) SET n.flag = true"))
    assert(BoltServer.isWriteStatement(
      "MERGE (n:P {key: 1}) ON CREATE SET n.v = 'SET x'"))
    assert(BoltServer.isWriteStatement("MATCH (n) DETACH DELETE n"))
  }

  test("corrupt payloads that pass the magic sniff fall back to the bin row") {
    import spark.implicits._
    import graft.operators.Multimodal
    // PNG magic + garbage → ImageIO.read returns null; JPEG magic + noise
    // → decoder throws; both must take the sentinel row, not NPE the task
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](32)(0x42)
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](16)(0x13)
    val df = Seq((1L, fakePng), (2L, fakeJpeg)).toDF("doc_id", "payload")
    val rows = Multimodal.decodeImageFeatures(df).collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      assert(r.getString(1) == "bin" && r.getInt(3) == -1 &&
        r.getInt(4) == -1 && r.getDouble(6) == -1.0, r.toString)
    }
  }
}
