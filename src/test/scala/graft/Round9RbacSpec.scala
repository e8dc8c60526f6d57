package graft

import java.io.ByteArrayOutputStream
import java.net.{Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources._
import graft.sources.ServerAuth.{Rbac, Role}

/** Round-9: role-based access control across all five servers
  * (auth.go:154-226 — roles admin/editor/viewer, per-operation
  * enforcement) plus the MCP task/tasks tools
  * (mcp/server.go:784-1022, tools.go:277-345).
  */
class Round9RbacSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()
  private val rbac = Rbac(Map(
    "tok-admin" -> Role.Admin,
    "tok-editor" -> Role.Editor,
    "tok-viewer" -> Role.Viewer))

  private def post(port: Int, path: String, body: String,
      bearer: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def emptyStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
  }

  // ==================================================== unit: roles ======

  test("role permissions mirror auth.go:183-188; JWTs resolve to roles") {
    import ServerAuth.{can, Permission => P}
    assert(can(Role.Admin, P.UserManage) && can(Role.Admin, P.Schema))
    assert(can(Role.Editor, P.Write) && can(Role.Editor, P.Delete))
    assert(!can(Role.Editor, P.Schema) && !can(Role.Editor, P.Admin))
    assert(can(Role.Viewer, P.Read) && !can(Role.Viewer, P.Write))
    assert(!can(Role.NoAccess, P.Read))

    val secret = "jwt-secret-at-least-32-chars-long!!".getBytes("UTF-8")
    val jwt = ServerAuth.mintJwt(secret, "alice", Seq(Role.Editor))
    assert(ServerAuth.validateJwt(secret, jwt).contains(Role.Editor))
    // multiple roles → strongest wins
    val multi = ServerAuth.mintJwt(secret, "bob", Seq(Role.Viewer, Role.Admin))
    assert(ServerAuth.validateJwt(secret, multi).contains(Role.Admin))
    // wrong secret / tampered payload / expired → rejected
    assert(ServerAuth.validateJwt("other-secret".getBytes("UTF-8"), jwt).isEmpty)
    val parts = jwt.split('.')
    assert(ServerAuth.validateJwt(secret,
      s"${parts(0)}.${parts(1)}x.${parts(2)}").isEmpty)
    val expired = ServerAuth.mintJwt(secret, "carol", Seq(Role.Admin),
      expEpochSec = 1000L)
    assert(ServerAuth.validateJwt(secret, expired).isEmpty)
    // provider-controlled identities with quotes can't break the payload
    val weird = ServerAuth.mintJwt(secret, "bob\",\"roles\":[\"admin", Seq(Role.Viewer))
    assert(ServerAuth.validateJwt(secret, weird).contains(Role.Viewer))
    // an Rbac with a jwtSecret accepts both static tokens and JWTs
    val r = Rbac(Map("tok" -> Role.Viewer), Some(secret))
    assert(r.resolve(Some("tok")).contains(Role.Viewer))
    assert(r.resolve(Some(jwt)).contains(Role.Editor))
    assert(r.resolve(Some("bogus")).isEmpty)
  }

  // ======================================================== GraphQL ======

  test("GraphQL: viewer reads, editor mutates, only admin clears") {
    val server = new GraphQlServer(emptyStore(), rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // unauthenticated → 401
      assert(post(p, "/graphql", "query { labels }", None)._1 == 401)
      // viewer read OK
      val (vs, vb) = post(p, "/graphql", "query { labels }", Some("tok-viewer"))
      assert(vs == 200 && vb.contains("\"labels\""))
      // viewer mutation → 403
      val (ms, mb) = post(p, "/graphql",
        """mutation { createNode(input: {labels: ["T"], properties: {key: "1"}}) { id } }""",
        Some("tok-viewer"))
      assert(ms == 403 && mb.contains("write permission required"), mb)
      // editor mutation OK
      val (es, eb) = post(p, "/graphql",
        """mutation { createNode(input: {labels: ["T"], properties: {key: "1"}}) { id } }""",
        Some("tok-editor"))
      assert(es == 200 && eb.contains("\"id\":\"T:1\""), eb)
      // editor clearAll → 403 (admin permission)
      val (cs, cb) = post(p, "/graphql",
        """mutation { clearAll(confirmPhrase: "DELETE ALL DATA") }""",
        Some("tok-editor"))
      assert(cs == 403 && cb.contains("admin permission required"), cb)
      // admin clearAll OK
      val (as_, _) = post(p, "/graphql",
        """mutation { clearAll(confirmPhrase: "DELETE ALL DATA") }""",
        Some("tok-admin"))
      assert(as_ == 200)
    } finally server.stop()
  }

  // ======================================================== HTTP-tx ======

  test("HTTP-tx: viewer writes refused, editor writes land, DDL is admin-only") {
    val store = emptyStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      def tx(stmt: String, tok: String): String =
        post(p, "/db/neo4j/tx/commit",
          s"""{"statements":[{"statement":"$stmt"}]}""", Some(tok))._2
      assert(post(p, "/db/neo4j/tx/commit",
        """{"statements":[]}""", None)._1 == 401)
      // viewer read OK, write Forbidden
      assert(tx("RETURN 1 AS one", "tok-viewer").contains("\"row\":[1]"))
      val vw = tx("CREATE (n:P {key: 7})", "tok-viewer")
      assert(vw.contains("Neo.ClientError.Security.Forbidden") &&
        vw.contains("Write permission required"), vw)
      assert(store.snapshot.nodes.count() == 0)
      // editor write OK
      assert(!tx("CREATE (n:P {key: 7})", "tok-editor").contains("Forbidden"))
      assert(store.snapshot.nodes.count() == 1)
      // editor DDL → Forbidden (schema); admin DDL OK
      val ed = tx("CREATE INDEX p_key FOR (n:P) ON (n.key)", "tok-editor")
      assert(ed.contains("Schema permission required"), ed)
      val ad = tx("CREATE INDEX p_key FOR (n:P) ON (n.key)", "tok-admin")
      assert(!ad.contains("Forbidden"), ad)
    } finally server.stop()
  }

  // =========================================================== Bolt ======

  private def struct(sig: Int, fields: Any*): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xB0 + fields.length); b.write(sig)
    fields.foreach(PackStream.write(b, _))
    b.toByteArray
  }

  private def readMessage(in: java.io.InputStream): Array[Byte] = {
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

  private def decodeMsg(m: Array[Byte]): (Int, Any) = {
    val sig = m(1) & 0xFF
    if (sig == 0x71) (sig, PackStream.decode(m, 0)._1)
    else PackStream.decode(m, 0)._1 match {
      case (s: Int, fields: Seq[_]) => (s, fields.headOption.orNull)
      case other => (sig, other)
    }
  }

  test("Bolt: viewer write statements FAIL with Forbidden, editor writes commit") {
    val store = emptyStore()
    val server = BoltServer.forStore(store, rbac = Some(rbac))
    server.start()
    try {
      def run(tok: String, query: String): (Int, Any) = {
        val sock = new Socket("127.0.0.1", server.boundPort)
        try {
          val out = sock.getOutputStream
          val in = sock.getInputStream
          out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
            0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
          out.flush()
          val v = new Array[Byte](4); assert(in.read(v) == 4)
          out.write(PackStream.frame(struct(0x01, Map(
            "user_agent" -> "rbac-spec/1.0", "scheme" -> "bearer",
            "credentials" -> tok))))
          out.flush()
          assert(decodeMsg(readMessage(in))._1 == 0x70, "HELLO failed")
          out.write(PackStream.frame(struct(0x10, query,
            Map.empty[String, Any], Map.empty[String, Any])))
          out.flush()
          decodeMsg(readMessage(in))
        } finally sock.close()
      }
      // viewer read OK
      assert(run("tok-viewer", "RETURN 1 AS one")._1 == 0x70)
      // viewer write → FAILURE Forbidden
      val (sig, meta) = run("tok-viewer", "CREATE (n:P {key: 3})")
      assert(sig == 0x7F, s"expected FAILURE, got $sig")
      assert(meta.asInstanceOf[Map[String, Any]]("code") ==
        "Neo.ClientError.Security.Forbidden")
      assert(store.snapshot.nodes.count() == 0)
      // editor write commits
      assert(run("tok-editor", "CREATE (n:P {key: 3})")._1 == 0x70)
      assert(store.snapshot.nodes.count() == 1)
    } finally server.stop()
  }

  // ========================================================= Qdrant ======

  test("Qdrant: viewer searches but cannot Upsert; snapshots are admin-only") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts, rbac = Some(rbac)).start()
    try {
      def call(method: String, msg: Protobuf.W, tok: Option[String]): String = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${server.boundPort}/qdrant.Points/$method"))
          .header("Content-Type", "application/grpc-web+proto")
          .POST(HttpRequest.BodyPublishers.ofByteArray(
            Protobuf.grpcFrame(0, msg.bytes)))
        tok.foreach(t => b.header("Authorization", s"Bearer $t"))
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
        val frames = Protobuf.grpcFrames(resp.body())
        new String(frames.find(_._1 == 0x80).get._2, "UTF-8")
      }
      def callSvc(svc: String, method: String, msg: Protobuf.W,
          tok: Option[String]): String = {
        val b = HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:${server.boundPort}/qdrant.$svc/$method"))
          .header("Content-Type", "application/grpc-web+proto")
          .POST(HttpRequest.BodyPublishers.ofByteArray(
            Protobuf.grpcFrame(0, msg.bytes)))
        tok.foreach(t => b.header("Authorization", s"Bearer $t"))
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
        val frames = Protobuf.grpcFrames(resp.body())
        new String(frames.find(_._1 == 0x80).get._2, "UTF-8")
      }
      val count = Protobuf.w().str(1, "embeddings")
      assert(call("Count", count, None).contains("grpc-status: 16"))
      assert(call("Count", count, Some("tok-viewer")).contains("grpc-status: 0"))
      // viewer Upsert → PERMISSION_DENIED 7 (before any engine work)
      val upsert = Protobuf.w().str(1, "embeddings")
      assert(call("Upsert", upsert, Some("tok-viewer")).contains("grpc-status: 7"))
      // editor may not take snapshots (admin), admin may not be refused
      val snap = Protobuf.w().str(1, "embeddings")
      assert(callSvc("Snapshots", "Create", snap, Some("tok-editor"))
        .contains("grpc-status: 7"))
      assert(!callSvc("Snapshots", "Create", snap, Some("tok-admin"))
        .contains("grpc-status: 7"))
    } finally server.stop()
  }

  // ============================================== MCP: RBAC + tasks ======

  test("MCP: viewer recalls but cannot store; task lifecycle + unblocked listing") {
    val server = new McpServer(emptyStore(), rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      def callTool(name: String, args: String, tok: String): (Int, String) =
        post(p, "/mcp",
          s"""{"jsonrpc":"2.0","id":9,"method":"tools/call","params":{"name":"$name","arguments":$args}}""",
          Some(tok))

      // tools/list now serves all six tools
      val (_, tl) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"tools/list","params":{}}""",
        Some("tok-viewer"))
      Seq("store", "recall", "discover", "link", "task", "tasks").foreach(t =>
        assert(tl.contains(s""""name":"$t""""), t))

      // viewer: recall OK, store 403, task 403
      assert(callTool("recall", "{}", "tok-viewer")._1 == 200)
      val (fs, fb) = callTool("store", """{"content":"x"}""", "tok-viewer")
      assert(fs == 403 && fb.contains("write permission"), fb)
      assert(callTool("task", """{"title":"t"}""", "tok-viewer")._1 == 403)

      // editor: create two tasks, the second depends on the first
      val (_, t1) = callTool("task",
        """{"title":"write the parser","priority":"high"}""", "tok-editor")
      assert(t1.contains("pending") && t1.contains("Task:"), t1)
      val id1 = """Task:-?\d+""".r.findFirstIn(t1).get
      val (_, t2) = callTool("task",
        s"""{"title":"test the parser","depends_on":["$id1"]}""", "tok-editor")
      val id2 = """Task:-?\d+""".r.findFirstIn(t2).get
      assert(id1 != id2)

      // blocked: only task 1 is unblocked while it's incomplete
      val (_, l1) = callTool("tasks", """{"unblocked_only":true}""", "tok-editor")
      assert(l1.contains(id1) && !l1.contains(id2), l1)

      // auto-toggle: pending → active → completed
      val (_, g1) = callTool("task", s"""{"id":"$id1"}""", "tok-editor")
      assert(g1.contains("active"), g1)
      val (_, g2) = callTool("task", s"""{"id":"$id1"}""", "tok-editor")
      assert(g2.contains("completed"), g2)

      // dependency completed → task 2 becomes unblocked
      val (_, l2) = callTool("tasks", """{"unblocked_only":true}""", "tok-editor")
      assert(l2.contains(id2), l2)

      // complete shorthand + stats + filters
      val (_, c2) = callTool("task", s"""{"id":"$id2","complete":true}""", "tok-editor")
      assert(c2.contains("completed"), c2)
      val (_, all) = callTool("tasks", "{}", "tok-editor")
      assert(all.contains("\\\"total\\\":2") &&
        all.contains("\\\"completed\\\":2"), all)
      val (_, hi) = callTool("tasks", """{"priority":["high"]}""", "tok-editor")
      assert(hi.contains(id1) && !hi.contains(id2), hi)

      // delete
      val (_, d1) = callTool("task", s"""{"id":"$id1","delete":true}""", "tok-editor")
      assert(d1.contains("deleted"), d1)
      val (_, afterDel) = callTool("tasks", "{}", "tok-editor")
      assert(!afterDel.contains(id1) && afterDel.contains(id2), afterDel)
    } finally server.stop()
  }

  // ========================================= user accounts + /auth/token ==

  test("OAuth token grant: users log in, JWTs carry roles, lockout after 5 failures") {
    val secret = "token-endpoint-secret-32-chars!!".getBytes("UTF-8")
    val auth = new sources.Authenticator(secret, lockoutDurationMs = 300L)
    assert(auth.createUser("alice", "alice-password", Seq(Role.Editor)).isRight)
    assert(auth.createUser("victor", "victor-password", Seq(Role.Viewer)).isRight)
    // password policy + duplicate user refused
    assert(auth.createUser("short", "tiny", Seq(Role.Viewer)).isLeft)
    assert(auth.createUser("alice", "alice-password-2", Seq(Role.Admin)).isLeft)

    val store = emptyStore()
    val server = new HttpTxServer(store,
      rbac = Some(auth.rbac()), authenticator = Some(auth)).start()
    try {
      val p = server.boundPort
      def tokenReq(user: String, pw: String, grant: String = "password"): (Int, String) =
        post(p, "/auth/token",
          s"""{"grant_type":"$grant","username":"$user","password":"$pw"}""", None)

      // RFC 6749 password grant shape
      val (s0, b0) = tokenReq("alice", "alice-password")
      assert(s0 == 200 && b0.contains("\"token_type\":\"Bearer\"") &&
        b0.contains("\"expires_in\":3600"), b0)
      val jwt = """"access_token":"([^"]+)"""".r
        .findFirstMatchIn(b0).get.group(1)

      // the minted JWT resolves to the user's role on the tx endpoint
      val w = post(p, "/db/neo4j/tx/commit",
        """{"statements":[{"statement":"CREATE (n:P {key: 11})"}]}""",
        Some(jwt))._2
      assert(!w.contains("Forbidden"), w)
      assert(store.snapshot.nodes.count() == 1)
      // a viewer's JWT cannot write
      val vJwt = """"access_token":"([^"]+)"""".r.findFirstMatchIn(
        tokenReq("victor", "victor-password")._2).get.group(1)
      val vw = post(p, "/db/neo4j/tx/commit",
        """{"statements":[{"statement":"CREATE (n:P {key: 12})"}]}""",
        Some(vJwt))._2
      assert(vw.contains("Write permission required"), vw)

      // unsupported grant type + unknown user never reveals existence
      assert(tokenReq("alice", "alice-password", grant = "client_credentials")._1 == 400)
      val (su, bu) = tokenReq("ghost", "whatever-pw")
      assert(su == 401 && bu.contains("invalid credentials"))

      // 5 wrong passwords lock the account (429), then the window passes
      (1 to 5).foreach(_ => assert(tokenReq("alice", "wrong-password")._1 == 401))
      val (sl, bl) = tokenReq("alice", "alice-password")
      assert(sl == 429 && bl.contains("locked"), bl)
      Thread.sleep(400) // lockoutDurationMs = 300
      assert(tokenReq("alice", "alice-password")._1 == 200)

      // disabled account refuses even the right password
      auth.setDisabled("victor", disabled = true)
      assert(tokenReq("victor", "victor-password")._1 == 401)
    } finally server.stop()
  }

  private def req(port: Int, method: String, path: String, body: String,
      bearer: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("user CRUD API requires user_manage (admin); full lifecycle over the wire") {
    val secret = "user-crud-endpoint-secret-32char".getBytes("UTF-8")
    val auth = new sources.Authenticator(secret)
    assert(auth.createUser("root", "root-password", Seq(Role.Admin)).isRight)
    val server = new HttpTxServer(emptyStore(),
      rbac = Some(auth.rbac(Map("tok-ed" -> Role.Editor))),
      authenticator = Some(auth)).start()
    try {
      val p = server.boundPort
      val rootJwt = """"access_token":"([^"]+)"""".r.findFirstMatchIn(
        post(p, "/auth/token",
          """{"grant_type":"password","username":"root","password":"root-password"}""",
          None)._2).get.group(1)
      // editor lacks user_manage; unauthenticated gets 401
      assert(req(p, "GET", "/auth/users", "", Some("tok-ed"))._1 == 403)
      assert(req(p, "GET", "/auth/users", "", None)._1 == 401)
      // create → list → get → update roles+disabled → delete
      val (cs, cb) = req(p, "POST", "/auth/users",
        """{"username":"bob","password":"bob-password","roles":["viewer"]}""",
        Some(rootJwt))
      assert(cs == 201 && cb.contains("\"roles\":[\"viewer\"]"), cb)
      assert(req(p, "GET", "/auth/users", "", Some(rootJwt))._2.contains("\"bob\""))
      assert(req(p, "GET", "/auth/users/bob", "", Some(rootJwt))._1 == 200)
      assert(req(p, "PUT", "/auth/users/bob",
        """{"roles":["editor"],"disabled":true}""", Some(rootJwt))._1 == 200)
      val (_, gb) = req(p, "GET", "/auth/users/bob", "", Some(rootJwt))
      assert(gb.contains("\"editor\"") && gb.contains("\"disabled\":true"), gb)
      // disabled bob cannot log in even with the right password
      assert(post(p, "/auth/token",
        """{"grant_type":"password","username":"bob","password":"bob-password"}""",
        None)._1 == 401)
      assert(req(p, "DELETE", "/auth/users/bob", "", Some(rootJwt))._1 == 200)
      assert(req(p, "GET", "/auth/users/bob", "", Some(rootJwt))._1 == 404)
    } finally server.stop()
  }

  test("API tokens mint admin-only; cookie and query-param credentials resolve") {
    val secret = "api-token-endpoint-secret-32char".getBytes("UTF-8")
    val auth = new sources.Authenticator(secret)
    assert(auth.createUser("root", "root-password", Seq(Role.Admin)).isRight)
    val server = new HttpTxServer(emptyStore(),
      rbac = Some(auth.rbac(Map("tok-ed" -> Role.Editor))),
      authenticator = Some(auth)).start()
    try {
      val p = server.boundPort
      val rootJwt = """"access_token":"([^"]+)"""".r.findFirstMatchIn(
        post(p, "/auth/token",
          """{"grant_type":"password","username":"root","password":"root-password"}""",
          None)._2).get.group(1)
      // editor may not mint; bad expires_in refused; admin mints
      assert(post(p, "/auth/api-token", """{"subject":"mcp"}""",
        Some("tok-ed"))._1 == 403)
      assert(post(p, "/auth/api-token",
        """{"subject":"mcp","expires_in":"soon"}""", Some(rootJwt))._1 == 400)
      val (ms, mb) = post(p, "/auth/api-token",
        """{"subject":"my-mcp-server","expires_in":"7d"}""", Some(rootJwt))
      assert(ms == 200 && mb.contains("\"subject\":\"my-mcp-server\""), mb)
      val apiTok = """"token":"([^"]+)"""".r.findFirstMatchIn(mb).get.group(1)

      val stmt = """{"statements":[{"statement":"RETURN 1 AS one"}]}"""
      // the minted token works as a Bearer credential...
      assert(post(p, "/db/neo4j/tx/commit", stmt, Some(apiTok))._2
        .contains("\"row\":[1]"))
      // ...as the browser cookie...
      val cookieResp = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/db/neo4j/tx/commit"))
        .header("Cookie", s"nornicdb_token=$apiTok")
        .POST(HttpRequest.BodyPublishers.ofString(stmt)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(cookieResp.body().contains("\"row\":[1]"), cookieResp.body())
      // ...and as an access_token query parameter
      val qResp = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/db/neo4j/tx/commit?access_token=$apiTok"))
        .POST(HttpRequest.BodyPublishers.ofString(stmt)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(qResp.body().contains("\"row\":[1]"), qResp.body())
      // no credential at all stays 401
      assert(post(p, "/db/neo4j/tx/commit", stmt, None)._1 == 401)
    } finally server.stop()
  }
}
