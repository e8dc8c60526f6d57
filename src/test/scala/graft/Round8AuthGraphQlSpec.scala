package graft

import java.io.ByteArrayOutputStream
import java.net.{Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphStore
import graft.sources.{BoltServer, GraphQlServer, HttpTxServer, McpServer, PackStream}

/** Round-8: bearer-token auth on all four server loops (the reference
  * refuses unauthenticated connections by default, `pkg/auth/auth.go`) and
  * the GraphQL executor's variables / fragments / aliases / mutations
  * (`pkg/graphql/schema/schema.graphql:984-1088`).
  */
class Round8AuthGraphQlSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String,
      bearer: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def freshStore() =
    new GraphStore(GraphQueries.graph(spark, sf), registerGlobal = false)

  // ============================================================ auth =====

  test("HTTP-tx server: 401 without bearer token, 200 with") {
    val server = new HttpTxServer(freshStore(), token = Some("s3cret")).start()
    try {
      val p = server.boundPort
      val body = """{"statements":[{"statement":"MATCH (r:Region) RETURN count(r) AS n"}]}"""
      val no = post(p, "/db/graft/tx/commit", body)
      assert(no.statusCode() == 401 && no.body().contains("Unauthorized"))
      val wrong = post(p, "/db/graft/tx/commit", body, Some("nope"))
      assert(wrong.statusCode() == 401)
      val ok = post(p, "/db/graft/tx/commit", body, Some("s3cret"))
      assert(ok.statusCode() == 200 && ok.body().contains("\"row\":[5]"))
    } finally server.stop()
  }

  test("MCP server: 401 without bearer token, tools list with") {
    val server = new McpServer(freshStore(), token = Some("s3cret")).start()
    try {
      val p = server.boundPort
      val no = post(p, "/mcp/tools/list", "{}")
      assert(no.statusCode() == 401 && no.body().contains("unauthorized"))
      val ok = post(p, "/mcp/tools/list", "{}", Some("s3cret"))
      assert(ok.statusCode() == 200 && ok.body().contains("recall"))
    } finally server.stop()
  }

  test("GraphQL server: 401 without bearer token, data with") {
    val server = new GraphQlServer(freshStore(), token = Some("s3cret")).start()
    try {
      val p = server.boundPort
      val no = post(p, "/graphql", """{"query":"query { labels }"}""")
      assert(no.statusCode() == 401 && no.body().contains("unauthorized"))
      val ok = post(p, "/graphql", """{"query":"query { labels }"}""", Some("s3cret"))
      assert(ok.statusCode() == 200 && ok.body().contains("\"Region\""))
    } finally server.stop()
  }

  test("Bolt server: RUN refused before auth, served after credentialed HELLO") {
    def struct(sig: Int, fields: Any*): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(0xB0 + fields.length); b.write(sig)
      fields.foreach(PackStream.write(b, _))
      b.toByteArray
    }
    def readMessage(in: java.io.InputStream): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      var done = false
      while (!done) {
        val h0 = in.read(); val h1 = in.read()
        require(h0 >= 0 && h1 >= 0, "stream closed mid-message")
        val size = (h0 << 8) | h1
        if (size == 0 && buf.size() > 0) done = true
        else if (size > 0) {
          val b = new Array[Byte](size)
          var off = 0
          while (off < size) {
            val r = in.read(b, off, size - off); require(r >= 0); off += r
          }
          buf.write(b)
        }
      }
      buf.toByteArray
    }
    def sigOf(m: Array[Byte]): Int = m(1) & 0xFF

    val g = GraphQueries.graph(spark, sf)
    val server = new BoltServer(() => g, token = Some("b0lt-t0ken")).start()
    try {
      def connect(): (Socket, java.io.InputStream, java.io.OutputStream) = {
        val sock = new Socket("127.0.0.1", server.boundPort)
        val out = sock.getOutputStream
        val in = sock.getInputStream
        out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
          0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
        out.flush()
        val version = new Array[Byte](4)
        assert(in.read(version) == 4)
        (sock, in, out)
      }

      // 1. HELLO without credentials → SUCCESS, but RUN → Unauthorized FAILURE
      val (s1, in1, out1) = connect()
      out1.write(PackStream.frame(struct(0x01,
        Map("user_agent" -> "spec/1.0", "scheme" -> "none"))))
      out1.flush()
      assert(sigOf(readMessage(in1)) == 0x70)
      out1.write(PackStream.frame(struct(0x10,
        "MATCH (r:Region) RETURN count(r) AS n", Map.empty[String, Any],
        Map.empty[String, Any])))
      out1.flush()
      val failMsg = readMessage(in1)
      assert(sigOf(failMsg) == 0x7F)
      assert(new String(failMsg, "ISO-8859-1").contains("Unauthorized"))
      s1.close()

      // 2. HELLO with wrong credentials → immediate FAILURE
      val (s2, in2, out2) = connect()
      out2.write(PackStream.frame(struct(0x01,
        Map("user_agent" -> "spec/1.0", "scheme" -> "bearer",
          "credentials" -> "wrong"))))
      out2.flush()
      assert(sigOf(readMessage(in2)) == 0x7F)
      s2.close()

      // 3. credentialed HELLO → RUN + PULL stream a real result
      val (s3, in3, out3) = connect()
      out3.write(PackStream.frame(struct(0x01,
        Map("user_agent" -> "spec/1.0", "scheme" -> "bearer",
          "credentials" -> "b0lt-t0ken"))))
      out3.flush()
      assert(sigOf(readMessage(in3)) == 0x70)
      out3.write(PackStream.frame(struct(0x10,
        "MATCH (r:Region) RETURN count(r) AS n", Map.empty[String, Any],
        Map.empty[String, Any])))
      out3.flush()
      assert(sigOf(readMessage(in3)) == 0x70) // SUCCESS {fields}
      out3.write(PackStream.frame(struct(0x3F, Map("n" -> -1L))))
      out3.flush()
      assert(sigOf(readMessage(in3)) == 0x71) // RECORD [5]
      assert(sigOf(readMessage(in3)) == 0x70) // SUCCESS summary
      s3.close()
    } finally server.stop()
  }

  test("GraphQL bulk mutations: create/delete nodes and relationships with skip semantics") {
    val server = new GraphQlServer(freshStore()).start()
    try {
      val p = server.boundPort
      // two fresh nodes + one duplicate of an existing id, skipDuplicates
      val bc = post(p, "/graphql",
        """{"query":"mutation B($in: BulkCreateNodesInput!) { bulkCreateNodes(input: $in) { created skipped } }","variables":{"in":{"skipDuplicates":true,"nodes":[{"labels":["Bulk"],"properties":{"key":1}},{"labels":["Bulk"],"properties":{"key":2}},{"labels":["Customer"],"properties":{"key":1}}]}}}""").body()
      assert(bc.contains("\"created\":2") && bc.contains("\"skipped\":1"), bc)

      // one valid + one dangling relationship, skipInvalid
      val br = post(p, "/graphql",
        """{"query":"mutation { bulkCreateRelationships(input: {skipInvalid: true, relationships: [{startNodeId: \"Bulk:1\", endNodeId: \"Bulk:2\", type: \"KNOWS\"}, {startNodeId: \"Bulk:1\", endNodeId: \"Ghost:9\", type: \"KNOWS\"}]}) { created skipped } }"}""").body()
      assert(br.contains("\"created\":1") && br.contains("\"skipped\":1"), br)

      // delete the relationship, then the nodes (one bogus id reported)
      val dr = post(p, "/graphql",
        """{"query":"mutation { bulkDeleteRelationships(ids: [\"KNOWS:Bulk:1->Bulk:2\", \"KNOWS:nope\"]) { deleted notFound } }"}""").body()
      assert(dr.contains("\"deleted\":1") && dr.contains("KNOWS:nope"), dr)
      val dn = post(p, "/graphql",
        """{"query":"mutation { bulkDeleteNodes(ids: [\"Bulk:1\", \"Bulk:2\", \"Bulk:99\"]) { deleted notFound } }"}""").body()
      assert(dn.contains("\"deleted\":2") && dn.contains("Bulk:99"), dn)
    } finally server.stop()
  }

  test("GraphQL maintenance mutations: triggerEmbedding, rebuildSearchIndex, runDecay, clearAll") {
    val g = GraphQueries.graph(spark, sf)
    val small = new GraphStore(graft.graph.PropertyGraph(
      g.nodes.filter(org.apache.spark.sql.functions.array_contains(
        org.apache.spark.sql.functions.col("labels"), "Region"))
        .localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val server = new GraphQlServer(small).start()
    try {
      val p = server.boundPort
      val te = post(p, "/graphql",
        """{"query":"mutation { triggerEmbedding { pending embedded total } }"}""").body()
      assert(te.contains("\"pending\":0") && te.contains("\"embedded\":5") &&
        te.contains("\"total\":5"), te)
      // regenerate path acknowledges too
      val te2 = post(p, "/graphql",
        """{"query":"mutation { triggerEmbedding(regenerate: true) { embedded total } }"}""").body()
      assert(te2.contains("\"embedded\":5"), te2)
      assert(post(p, "/graphql",
        """{"query":"mutation { rebuildSearchIndex }"}""").body()
        .contains("\"rebuildSearchIndex\":true"))
      val rd = post(p, "/graphql",
        """{"query":"mutation { runDecay { nodesProcessed nodesDecayed averageDecayScore } }"}""").body()
      assert(rd.contains("\"nodesProcessed\":0"), rd)
      // wrong phrase refused, right phrase wipes
      val bad = post(p, "/graphql",
        """{"query":"mutation { clearAll(confirmPhrase: \"nope\") }"}""").body()
      assert(bad.contains("invalid confirmation phrase"), bad)
      val ok = post(p, "/graphql",
        """{"query":"mutation { clearAll(confirmPhrase: \"DELETE ALL DATA\") }"}""").body()
      assert(ok.contains("\"clearAll\":true"), ok)
      assert(small.snapshot.nodes.count() == 0)
    } finally server.stop()
  }

  test("store-backed Bolt serves write statements through CypherWrite") {
    def struct(sig: Int, fields: Any*): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(0xB0 + fields.length); b.write(sig)
      fields.foreach(PackStream.write(b, _))
      b.toByteArray
    }
    def readMessage(in: java.io.InputStream): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      var done = false
      while (!done) {
        val h0 = in.read(); val h1 = in.read()
        require(h0 >= 0 && h1 >= 0)
        val size = (h0 << 8) | h1
        if (size == 0 && buf.size() > 0) done = true
        else if (size > 0) {
          val b = new Array[Byte](size)
          var off = 0
          while (off < size) { val r = in.read(b, off, size - off); require(r >= 0); off += r }
          buf.write(b)
        }
      }
      buf.toByteArray
    }
    val store = freshStore()
    val server = BoltServer.forStore(store).start()
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
        0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)); out.flush()
      assert(in.read(new Array[Byte](4)) == 4)
      def run(q: String): Int = {
        out.write(PackStream.frame(struct(0x10, q, Map.empty[String, Any],
          Map.empty[String, Any]))); out.flush()
        (readMessage(in)(1) & 0xFF)
      }
      out.write(PackStream.frame(struct(0x01,
        Map("user_agent" -> "spec/1.0", "scheme" -> "none")))); out.flush()
      assert((readMessage(in)(1) & 0xFF) == 0x70)
      // a stock driver's CREATE goes through CypherWrite and commits
      assert(run("CREATE (p:BoltPerson {key: 1, name: 'wire'})") == 0x70)
      // DISCARD the (empty) result stream, then read it back
      out.write(PackStream.frame(struct(0x2F, Map("n" -> -1L)))); out.flush()
      assert((readMessage(in)(1) & 0xFF) == 0x70)
      assert(run("MATCH (p:BoltPerson) RETURN count(*) AS n") == 0x70)
      out.write(PackStream.frame(struct(0x3F, Map("n" -> -1L)))); out.flush()
      val rec = readMessage(in)
      assert((rec(1) & 0xFF) == 0x71) // RECORD [1]
      assert((readMessage(in)(1) & 0xFF) == 0x70)
      assert(store.snapshot.nodes.filter(
        org.apache.spark.sql.functions.col("id") === "BoltPerson:1").count() == 1)
      sock.close()
    } finally server.stop()
  }

  // ================================================ GraphQL executor =====

  test("GraphQL variables, fragments, aliases resolve") {
    val server = new GraphQlServer(freshStore()).start()
    try {
      val p = server.boundPort
      // fragment + variable (spread + substitution through the parser)
      val resp = post(p, "/graphql",
        """{"query":"fragment Core on Node { id labels } query N($nid: ID!) { node(id: $nid) { ...Core } }","variables":{"nid":"Region:0"}}""").body()
      assert(resp.contains("\"id\":\"Region:0\""), resp)
      assert(resp.contains("\"labels\":[\"Region\"]"), resp)

      // variable default + operationName selection + alias
      val resp2 = post(p, "/graphql",
        """{"query":"query A { labels } query B($lbl: String = \"Region\") { howMany: nodeCount(label: $lbl) }","operationName":"B"}""").body()
      assert(resp2.contains("\"howMany\":5"), resp2)

      // inline fragment
      val resp3 = post(p, "/graphql",
        """{"query":"query { node(id: \"Region:1\") { ... on Node { id } } }"}""").body()
      assert(resp3.contains("\"id\":\"Region:1\""), resp3)

      // missing required variable → error envelope
      val resp4 = post(p, "/graphql",
        """{"query":"query N($nid: ID!) { node(id: $nid) { id } }"}""").body()
      assert(resp4.contains("errors") && resp4.contains("$nid"), resp4)
    } finally server.stop()
  }

  test("GraphQL docs examples: stats, node traversal, neighbors, search") {
    val server = new GraphQlServer(freshStore()).start()
    try {
      val p = server.boundPort
      // the docs' Stats query verbatim (unknown fields resolve to null)
      val stats = post(p, "/graphql",
        """{"query":"query Stats { stats { nodeCount relationshipCount embeddedNodeCount uptimeSeconds labels { label count } } }"}""").body()
      assert(stats.contains("\"nodeCount\":") &&
        stats.contains("\"label\":\"Region\""), stats)

      // the docs' GetNode with variables, verbatim shape
      val node = post(p, "/graphql",
        """{"query":"query GetNode($id: ID!) { node(id: $id) { id labels properties } }","variables":{"id":"Customer:1"}}""").body()
      assert(node.contains("\"id\":\"Customer:1\""), node)

      // NodeWithRelationships: outgoing with nested endNode
      val rels = post(p, "/graphql",
        """{"query":"query { node(id: \"Customer:1\") { id outgoing(limit: 50) { type endNodeId endNode { id labels } } } }"}""").body()
      assert(rels.contains("\"type\":\"FROM\""), rels)
      assert(rels.contains("\"type\":\"PLACED\""), rels)
      assert("\"labels\":\\[\"Nation\"\\]".r.findFirstIn(rels).isDefined, rels)
      // type filter narrows
      val only = post(p, "/graphql",
        """{"query":"query { node(id: \"Customer:1\") { outgoing(types: [\"FROM\"]) { type } } }"}""").body()
      assert(only.contains("FROM") && !only.contains("PLACED"), only)

      // neighbors with direction
      val nbrs = post(p, "/graphql",
        """{"query":"query { node(id: \"Region:0\") { neighbors(direction: INCOMING, limit: 3) { id labels } } }"}""").body()
      assert(nbrs.contains("\"labels\":[\"Nation\"]"), nbrs)

      // the docs' search field: BM25 over the name property finds the
      // customer by its unique name token; HYBRID fuses with the (empty)
      // vector leg and still ranks it
      val bm = post(p, "/graphql",
        """{"query":"query { search(query: \"Customer#000000001\", options: {limit: 5, labels: [\"Customer\"], method: BM25}) { results { node { id } score } totalCount } }"}""").body()
      assert(bm.contains("\"id\":\"Customer:1\""), bm)
      assert(bm.contains("\"totalCount\":"), bm)
      val hy = post(p, "/graphql",
        """{"query":"query Search { search(query: \"Customer#000000001\", options: { limit: 10, labels: [\"Customer\"], method: HYBRID }) { results { node { id labels properties } score rrfScore } totalCount executionTimeMs } }"}""").body()
      assert(hy.contains("\"id\":\"Customer:1\"") && hy.contains("rrfScore"), hy)
    } finally server.stop()
  }

  test("GraphQL mutations: create/update/merge/delete node, relationship, executeCypher") {
    val server = new GraphQlServer(freshStore()).start()
    try {
      val p = server.boundPort
      // createNode via variables (the reference's CreateNodeInput shape)
      val created = post(p, "/graphql",
        """{"query":"mutation M($in: CreateNodeInput!) { createNode(input: $in) { id labels properties } }","variables":{"in":{"labels":["Person"],"properties":{"key":9001,"name":"ada"}}}}""").body()
      assert(created.contains("\"id\":\"Person:9001\""), created)
      assert(created.contains("\"labels\":[\"Person\"]"), created)
      assert(created.contains("\"name\":\"ada\""), created)

      // updateNode
      val updated = post(p, "/graphql",
        """{"query":"mutation { updateNode(input: {id: \"Person:9001\", properties: {name: \"lovelace\"}}) { id properties } }"}""").body()
      assert(updated.contains("\"name\":\"lovelace\""), updated)

      // mergeNode: ON MATCH update path
      val merged = post(p, "/graphql",
        """{"query":"mutation { mergeNode(labels: [\"Person\"], matchProperties: {key: 9001}, setProperties: {name: \"merged\"}) { id properties } }"}""").body()
      assert(merged.contains("\"name\":\"merged\""), merged)

      // createRelationship + deleteRelationship
      val rel = post(p, "/graphql",
        """{"query":"mutation { createRelationship(input: {startNodeId: \"Person:9001\", endNodeId: \"Region:0\", type: \"LIVES_IN\"}) { id type } }"}""").body()
      assert(rel.contains("\"type\":\"LIVES_IN\""), rel)
      val delRel = post(p, "/graphql",
        """{"query":"mutation { deleteRelationship(id: \"LIVES_IN:Person:9001->Region:0\") }"}""").body()
      assert(delRel.contains("\"deleteRelationship\":true"), delRel)

      // executeCypher write pass-through
      val cy = post(p, "/graphql",
        """{"query":"mutation { executeCypher(input: {query: \"MATCH (n:Person) SET n.mktsegment = 'X'\"}) { columns rows } }"}""").body()
      assert(cy.contains("columns"), cy)

      // deleteNode (detach)
      val deleted = post(p, "/graphql",
        """{"query":"mutation { deleteNode(id: \"Person:9001\") }"}""").body()
      assert(deleted.contains("\"deleteNode\":true"), deleted)
      val gone = post(p, "/graphql",
        """{"query":"query { node(id: \"Person:9001\") { id } }"}""").body()
      assert(gone.contains("\"node\":null"), gone)
    } finally server.stop()
  }
}
