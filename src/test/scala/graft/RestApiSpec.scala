package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.{Authenticator, HttpTxServer, ServerAuth}
import graft.sources.ServerAuth.{Rbac, Role}

/** Integration: the reference server's plain-REST surface on the shared
  * HTTP listener (`/root/reference/pkg/server/server_router.go:100-170`)
  * — discovery/health/status/metrics, the native `/nornicdb` API with
  * the embed-worker lifecycle, GDPR export/delete, admin endpoints, and
  * auth self-service — all over a real TCP port with RBAC enforced per
  * route (401 unauthenticated, 403 on missing permission).
  */
class RestApiSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def req(port: Int, method: String, path: String, body: String,
      bearer: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def get(port: Int, path: String, bearer: Option[String] = None) = {
    val r = req(port, "GET", path, "", bearer)
    (r.statusCode(), r.body())
  }

  private def post(port: Int, path: String, body: String,
      bearer: Option[String] = None): (Int, String) = {
    val r = req(port, "POST", path, body, bearer)
    (r.statusCode(), r.body())
  }

  private val rbac = Rbac(Map(
    "tok-admin" -> Role.Admin,
    "tok-editor" -> Role.Editor,
    "tok-viewer" -> Role.Viewer))

  private def tpchStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.localCheckpoint(true), g.edges.localCheckpoint(true)),
      registerGlobal = false)
  }

  // ============================================ discovery & health =======

  test("discovery, health, status and Prometheus metrics") {
    val store = tpchStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // GET / — Neo4j discovery document, unauthenticated
      val (ds, db) = get(p, "/")
      assert(ds == 200 && db.contains("\"bolt_direct\":\"bolt://") &&
        db.contains("/db/{databaseName}/tx") &&
        db.contains("\"neo4j_version\""), db)
      // unknown paths fall through the "/" context to a Neo4j 404 envelope
      val (ns, nb) = get(p, "/no-such-route")
      assert(ns == 404 && nb.contains("Neo.ClientError.Request.Invalid"), nb)
      // JDK raw-prefix contexts must not leak: /healthz, /database 404;
      // bare /db wants a database name
      assert(get(p, "/healthz")._1 == 404)
      assert(get(p, "/database", Some("tok-viewer"))._1 == 404)
      assert(get(p, "/db", Some("tok-viewer"))._1 == 400)
      assert(get(p, "/statusx", Some("tok-viewer"))._1 == 404)
      // /health is unauthenticated and minimal
      assert(get(p, "/health") == ((200, """{"status":"healthy"}""")))
      // /status needs a credential
      assert(get(p, "/status")._1 == 401)
      val (ss, sb) = get(p, "/status", Some("tok-viewer"))
      val nNodes = store.snapshot.nodes.count()
      assert(ss == 200 && sb.contains(s""""nodes":$nNodes""") &&
        sb.contains("\"uptime_seconds\"") && sb.contains("\"requests\""), sb)
      // /metrics is the Prometheus text exposition with reference names
      val mr = req(p, "GET", "/metrics", "", Some("tok-viewer"))
      assert(mr.statusCode() == 200)
      assert(mr.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/plain"))
      val mb = mr.body()
      assert(mb.contains(s"nornicdb_nodes_total $nNodes") &&
        mb.contains("# TYPE nornicdb_requests_total counter") &&
        mb.contains("# HELP nornicdb_uptime_seconds"), mb)
      // middleware counters observed the earlier requests
      val (_, sb2) = get(p, "/status", Some("tok-viewer"))
      val reqCount = """"requests":(\d+)""".r.findFirstMatchIn(sb2).get
        .group(1).toLong
      assert(reqCount >= 6, sb2)
      val errCount = """"errors":(\d+)""".r.findFirstMatchIn(sb2).get
        .group(1).toLong
      assert(errCount >= 2, sb2) // the 404 + the 401 above
    } finally server.stop()
  }

  // ================================================== /nornicdb/* =======

  test("nornicdb: search, decay, embed worker lifecycle, similar") {
    val store = tpchStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // hybrid search through the shared engine: BM25 matches on name
      val (ss, sb) = post(p, "/nornicdb/search",
        """{"query":"Customer#000000001","limit":3}""", Some("tok-viewer"))
      assert(ss == 200 && sb.startsWith("[") && sb.contains("\"node\":{\"id\":") &&
        sb.contains("Customer:1") && sb.contains("\"score\":"), sb)
      // label filter restricts the hit set
      val (ls, lb) = post(p, "/nornicdb/search",
        """{"query":"Customer#000000001","labels":["Nation"],"limit":3}""",
        Some("tok-viewer"))
      assert(ls == 200 && !lb.contains("Customer:1"), lb)
      // content-property documents are searchable (SearchableProperties,
      // indexing/config.go:104 — not just the name column)
      graft.cypher.CypherWrite.execute(store,
        "CREATE (d:Doc {key: 900100, content: 'qzx vector databases are fast', title: 'qzx intro'})")
      val (ds, db2) = post(p, "/nornicdb/search",
        """{"query":"qzx","limit":3}""", Some("tok-viewer"))
      assert(ds == 200 && db2.contains("Doc:900100"), db2)

      // decay config mirrors the reference defaults (db.go:950-957)
      val (dcs, dcb) = get(p, "/nornicdb/decay", Some("tok-viewer"))
      assert(dcs == 200 && dcb.contains("\"archiveThreshold\":0.05") &&
        dcb.contains("\"recency\":0.4"), dcb)

      // embed worker: trigger needs write → viewer 403, editor runs it
      assert(post(p, "/nornicdb/embed/trigger", "", Some("tok-viewer"))._1 == 403)
      val (ts, tb) = post(p, "/nornicdb/embed/trigger", "", Some("tok-editor"))
      assert(ts == 200 && tb.contains("\"triggered\":true") &&
        tb.contains("\"pending\":0"), tb)
      val total = store.snapshot.nodes.count()
      val (es, eb) = get(p, "/nornicdb/embed/stats", Some("tok-viewer"))
      assert(es == 200 && eb.contains(s""""total_embeddings":$total""") &&
        eb.contains("\"configured_model\""), eb)

      // similar: cosine top-k excluding the target, 404 unknown node
      val (sim, simB) = post(p, "/nornicdb/similar",
        """{"node_id":"Customer:1","limit":3}""", Some("tok-viewer"))
      assert(sim == 200 && !simB.contains("\"id\":\"Customer:1\"") &&
        simB.contains("\"score\":"), simB)
      val scores = """"score":([-0-9.eE]+)""".r.findAllMatchIn(simB)
        .map(_.group(1).toDouble).toSeq
      assert(scores.length == 3 && scores == scores.sorted.reverse, simB)
      assert(post(p, "/nornicdb/similar", """{"node_id":"Ghost:99"}""",
        Some("tok-viewer"))._1 == 404)

      // clear is admin-only; after it, similar reports the missing vector
      assert(post(p, "/nornicdb/embed/clear", "", Some("tok-editor"))._1 == 403)
      val (cs, cb) = post(p, "/nornicdb/embed/clear", "", Some("tok-admin"))
      assert(cs == 200 && cb.contains(s""""cleared":$total"""), cb)
      val (bs, bb) = post(p, "/nornicdb/similar",
        """{"node_id":"Customer:1"}""", Some("tok-viewer"))
      assert(bs == 400 && bb.contains("no embedding"), bb)
      // rebuild acknowledges (indexes are snapshot thunks, never stale)
      val (rs, rb) = post(p, "/nornicdb/search/rebuild",
        """{"database":"neo4j"}""", Some("tok-editor"))
      assert(rs == 200 && rb.contains("\"success\":true"), rb)
    } finally server.stop()
  }

  // ======================================================= /gdpr/* ======

  test("gdpr export/delete honor self-or-admin, confirm, and formats") {
    // Customer nodes owned by user{key % 10} (the PrivacySpec tagging)
    val g = GraphQueries.graph(spark, sf)
    val isCust = array_contains(col("labels"), "Customer")
    val tagged = g.nodes.withColumn("properties",
      when(isCust, map_concat(col("properties"),
        map(lit("owner_id"), concat(lit("user"), col("key") % 10))))
        .otherwise(col("properties")))
    val store = new GraphStore(PropertyGraph(
      tagged.localCheckpoint(true), g.edges.localCheckpoint(true)),
      registerGlobal = false)
    val secret = "gdpr-endpoint-secret-32-chars!!!".getBytes("UTF-8")
    val auth = new Authenticator(secret)
    assert(auth.createUser("user3", "user3-password", Seq(Role.Editor)).isRight)
    assert(auth.createUser("root", "root-password", Seq(Role.Admin)).isRight)
    val u3 = ServerAuth.mintJwt(secret, "user3", Seq(Role.Editor))
    val root = ServerAuth.mintJwt(secret, "root", Seq(Role.Admin))
    val server = new HttpTxServer(store,
      rbac = Some(auth.rbac()), authenticator = Some(auth)).start()
    try {
      val p = server.boundPort
      val owned3 = store.snapshot.nodes
        .filter(element_at(col("properties"), "owner_id") === "user3").count()
      assert(owned3 > 0)
      // own export: JSON attachment listing exactly the owned nodes
      val er = req(p, "POST", "/gdpr/export", """{"user_id":"user3"}""", Some(u3))
      assert(er.statusCode() == 200)
      assert(er.headers().firstValue("Content-Disposition").orElse("")
        .contains("user_data.json"))
      val ids = """"id":"([^"]+)"""".r.findAllMatchIn(er.body())
        .map(_.group(1)).toSeq
      assert(ids.length == owned3 && ids.forall(_.startsWith("Customer:")),
        er.body().take(300))
      // CSV form
      val cr = req(p, "POST", "/gdpr/export",
        """{"user_id":"user3","format":"csv"}""", Some(u3))
      assert(cr.statusCode() == 200 &&
        cr.body().startsWith("id,labels,properties\n") &&
        cr.body().linesIterator.size.toLong == owned3 + 1, cr.body().take(200))
      // another user's data: 403 for non-admin, 200 for admin
      val (fs, fb) = post(p, "/gdpr/export", """{"user_id":"user4"}""", Some(u3))
      assert(fs == 403 && fb.contains("own data"), fb)
      assert(post(p, "/gdpr/export", """{"user_id":"user4"}""", Some(root))._1 == 200)
      // delete without confirm refused; with confirm erases the subject
      assert(post(p, "/gdpr/delete",
        """{"user_id":"user3"}""", Some(u3))._1 == 400)
      val (dls, dlb) = post(p, "/gdpr/delete",
        """{"user_id":"user3","confirm":true}""", Some(u3))
      assert(dls == 200 && dlb.contains("\"status\":\"deleted\""), dlb)
      assert(store.snapshot.nodes
        .filter(element_at(col("properties"), "owner_id") === "user3")
        .count() == 0)
      // anonymize keeps the rows but re-owners them to the pseudonym
      val before4 = store.snapshot.nodes
        .filter(element_at(col("properties"), "owner_id") === "user4").count()
      val totalCust = store.snapshot.nodes.filter(isCust).count()
      val (ans, anb) = post(p, "/gdpr/delete",
        """{"user_id":"user4","confirm":true,"anonymize":true}""", Some(root))
      assert(ans == 200 && anb.contains("\"status\":\"anonymized\""), anb)
      // pseudonymized, not erased: rows survive under an anon_ owner
      assert(store.snapshot.nodes
        .filter(element_at(col("properties"), "owner_id") === "user4")
        .count() == 0)
      assert(store.snapshot.nodes.filter(isCust).count() == totalCust)
      assert(store.snapshot.nodes
        .filter(element_at(col("properties"), "owner_id").startsWith("anon"))
        .count() == before4)
    } finally server.stop()
  }

  // ====================================================== /admin/* ======

  test("admin stats/config/backup are admin-gated; backup persists parquet") {
    val store = tpchStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      assert(get(p, "/admin/stats", Some("tok-editor"))._1 == 403)
      val (ss, sb) = get(p, "/admin/stats", Some("tok-admin"))
      val nNodes = store.snapshot.nodes.count()
      assert(ss == 200 && sb.contains(s""""node_count":$nNodes""") &&
        sb.contains("\"per_database\"") && sb.contains("\"alloc_mb\""), sb)
      val (cs, cb) = get(p, "/admin/config", Some("tok-admin"))
      assert(cs == 200 && cb.contains(s""""port":$p"""), cb)
      // backup: missing path 400; real path writes the snapshot
      assert(post(p, "/admin/backup", "{}", Some("tok-admin"))._1 == 400)
      val dir = Files.createTempDirectory("rest-backup").toString
      val (bs, bb) = post(p, "/admin/backup",
        s"""{"path":"$dir"}""", Some("tok-admin"))
      assert(bs == 200 && bb.contains("backup complete"), bb)
      val back = spark.read.parquet(s"$dir/nodes")
      assert(back.count() == nNodes)
    } finally server.stop()
  }

  // ============================================ auth self-service =======

  test("auth self-service: config, me, password change, profile, logout") {
    val secret = "self-service-secret-32-chars!!!!".getBytes("UTF-8")
    val auth = new Authenticator(secret)
    assert(auth.createUser("alice", "alice-password", Seq(Role.Editor)).isRight)
    val server = new HttpTxServer(tpchStore(),
      rbac = Some(auth.rbac(Map("tok-static" -> Role.Admin))),
      authenticator = Some(auth)).start()
    try {
      val p = server.boundPort
      // bootstrap config is public
      val (cs, cb) = get(p, "/auth/config")
      assert(cs == 200 && cb.contains("\"securityEnabled\":true"), cb)
      val jwt = ServerAuth.mintJwt(secret, "alice", Seq(Role.Editor))
      // /auth/me: JWT carries the subject; static tokens have none
      val (ms, mb) = get(p, "/auth/me", Some(jwt))
      assert(ms == 200 && mb.contains("\"username\":\"alice\"") &&
        mb.contains("\"roles\":[\"editor\"]"), mb)
      assert(get(p, "/auth/me", Some("tok-static"))._1 == 401)
      assert(get(p, "/auth/me")._1 == 401)
      // password change: wrong old → 401 and nothing changes
      assert(post(p, "/auth/password",
        """{"old_password":"nope","new_password":"new-password-1"}""",
        Some(jwt))._1 == 401)
      assert(auth.authenticate("alice", "alice-password").isRight)
      // right old, policy-passing new → 200; only the new password works
      val (ps, pb) = post(p, "/auth/password",
        """{"old_password":"alice-password","new_password":"new-password-1"}""",
        Some(jwt))
      assert(ps == 200, pb)
      assert(auth.authenticate("alice", "alice-password").isLeft)
      assert(auth.authenticate("alice", "new-password-1").isRight)
      // too-short new password refused with the policy message
      val (ws, wb) = post(p, "/auth/password",
        """{"old_password":"new-password-1","new_password":"x"}""", Some(jwt))
      assert(ws == 400 && wb.contains("minimum length"), wb)
      // profile: set email + metadata, then delete a key with ""
      val pr = req(p, "PUT", "/auth/profile",
        """{"email":"alice@example.com","metadata":{"team":"graph","tmp":"1"}}""",
        Some(jwt))
      assert(pr.statusCode() == 200, pr.body())
      val (_, me2) = get(p, "/auth/me", Some(jwt))
      assert(me2.contains("\"email\":\"alice@example.com\"") &&
        me2.contains("\"team\":\"graph\"") && me2.contains("\"tmp\":\"1\""), me2)
      req(p, "PUT", "/auth/profile", """{"metadata":{"tmp":""}}""", Some(jwt))
      val (_, me3) = get(p, "/auth/me", Some(jwt))
      assert(!me3.contains("\"tmp\"") && me3.contains("\"team\":\"graph\""), me3)
      // logout clears the browser cookie
      val lr = req(p, "POST", "/auth/logout", "", None)
      assert(lr.statusCode() == 200 &&
        lr.headers().allValues("Set-Cookie").toString.contains("Max-Age=0"))
    } finally server.stop()
  }

  test("explicit transactions, database info, cluster status (server_db.go:29-59)") {
    val store = tpchStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // GET /db/{db} — info with live counts
      val (is, ib) = get(p, "/db/neo4j", Some("tok-viewer"))
      assert(is == 200 && ib.contains("\"default\":true") &&
        ib.contains(s""""nodeCount":${store.snapshot.nodes.count()}"""), ib)
      assert(get(p, "/db/other", Some("tok-viewer"))._2
        .contains("\"default\":false"))
      // GET /db/{db}/cluster — standalone
      val (cs, cb) = get(p, "/db/neo4j/cluster", Some("tok-viewer"))
      assert(cs == 200 && cb.contains("\"mode\":\"standalone\""), cb)
      // open an explicit tx: 201, commit URL, 30s expiry, statements run
      val (os, ob) = post(p, "/db/neo4j/tx",
        """{"statements":[{"statement":"RETURN 1 AS a"}]}""", Some("tok-editor"))
      assert(os == 201 && ob.contains(""""columns":["a"]""") &&
        ob.contains("\"expires\":"), ob)
      val commitUrl = """"commit":"([^"]+)"""".r.findFirstMatchIn(ob).get.group(1)
      assert(commitUrl.contains(s"/db/neo4j/tx/") && commitUrl.endsWith("/commit"))
      val txPath = commitUrl.replaceFirst("http://[^/]+", "")
        .stripSuffix("/commit")
      // execute in the open tx (immediate execution, server_db.go:1186)
      val (xs, xb) = post(p, txPath,
        """{"statements":[{"statement":"CREATE (n:TxSpec {key: 900001})"}]}""",
        Some("tok-editor"))
      assert(xs == 200 && xb.contains(""""errors":[]"""), xb)
      assert(store.snapshot.nodes
        .filter(col("id") === "TxSpec:900001").count() == 1)
      // commit with a final statement: 200 + lastBookmarks
      val (fs, fb) = post(p, s"$txPath/commit",
        """{"statements":[{"statement":"RETURN 2 AS b"}]}""", Some("tok-editor"))
      assert(fs == 200 && fb.contains(""""columns":["b"]""") &&
        fb.contains("\"lastBookmarks\":[\"FB:nornicdb:"), fb)
      // rollback acknowledges (simplified model: immediate execution)
      val rr = req(p, "DELETE", txPath, "", Some("tok-editor"))
      assert(rr.statusCode() == 200 &&
        rr.body() == """{"results":[],"errors":[]}""")
      // viewer still cannot write through the explicit path
      val (vs, vb) = post(p, "/db/neo4j/tx",
        """{"statements":[{"statement":"CREATE (n:TxSpec {key: 900002})"}]}""",
        Some("tok-viewer"))
      assert(vs == 201 && vb.contains("Write permission required"), vb)
      // wrong method / unknown endpoint shapes
      assert(get(p, "/db/neo4j/tx", Some("tok-viewer"))._1 == 405)
      assert(get(p, "/db/neo4j/nope", Some("tok-viewer"))._1 == 404)
    } finally server.stop()
  }

  test("gpu admin stubs, oauth-not-configured, MCP mounted on the shared port") {
    val store = tpchStore()
    val server = new HttpTxServer(store, rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      // GPU: status reports no manager (this engine's accel is Tungsten)
      val (gs, gb) = get(p, "/admin/gpu/status", Some("tok-admin"))
      assert(gs == 200 && gb.contains("\"available\":false"), gb)
      assert(post(p, "/admin/gpu/enable", "", Some("tok-admin"))._1 == 503)
      assert(post(p, "/admin/gpu/test", "", Some("tok-admin"))._1 == 503)
      // OAuth endpoints refuse like the reference's nil manager
      val (os, ob) = get(p, "/auth/oauth/redirect")
      assert(os == 400 && ob.contains("OAuth not configured"), ob)
      // MCP rides the same listener: health public, RPC behind RBAC
      assert(get(p, "/mcp/health") == ((200, """{"status":"healthy"}""")))
      val (ms, mb) = post(p, "/mcp",
        """{"jsonrpc":"2.0","id":1,"method":"initialize"}""", Some("tok-viewer"))
      assert(ms == 200 && mb.contains("\"protocolVersion\""), mb)
      val (ls, lb) = post(p, "/mcp/tools/list", "{}", Some("tok-viewer"))
      assert(ls == 200 && lb.contains("\"task\"") && lb.contains("\"recall\""), lb)
      // per-tool RBAC: viewer may not store, editor may
      val storeCall =
        """{"jsonrpc":"2.0","id":2,"method":"tools/call","params":{"name":"store","arguments":{"content":"mounted mcp spec row"}}}"""
      assert(post(p, "/mcp", storeCall, Some("tok-viewer"))._1 == 403)
      assert(post(p, "/mcp", storeCall, Some("tok-editor"))._1 == 200)
      assert(post(p, "/mcp", storeCall, None)._1 == 401)
    } finally server.stop()
  }

  test("auth self-service without an authenticator: anonymous admin, 503 on change") {
    val server = new HttpTxServer(tpchStore(), rbac = Some(rbac)).start()
    try {
      val p = server.boundPort
      val (ms, mb) = get(p, "/auth/me", Some("tok-viewer"))
      assert(ms == 200 && mb.contains("\"username\":\"anonymous\""), mb)
      val (cs, cb) = get(p, "/auth/config")
      assert(cs == 200 && cb.contains("\"securityEnabled\":false"), cb)
      assert(post(p, "/auth/password",
        """{"old_password":"a","new_password":"b"}""",
        Some("tok-viewer"))._1 == 503)
    } finally server.stop()
  }
}
