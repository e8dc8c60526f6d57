package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.search.{HttpReranker, HttpRerankerConfig}
import graft.sources.{Authenticator, GraftConfig, ServerAuth}

/** Round-11 ADVICE findings, each reproduced then asserted fixed:
  *
  *   1. /api/bifrost must sit behind the same auth the reference's
  *      withAuth wrapper applies (server_router.go:211-219);
  *   2. a configured admin password shorter than min_password_length
  *      must log in exactly as written (main.go:534 bootstrap bypass);
  *   3. TLS configured-but-unloadable must fail boot, never fall back to
  *      cleartext listeners;
  *   4. an Rbac with real credential sources must refuse an invalid
  *      credential instead of downgrading it to openRole;
  *   5. the rerank encoder must degrade to pass-through when the
  *      candidate collect itself fails (rerank.go:152-156).
  */
class Round11AdviceSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def get(url: String, token: Option[String] = None): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(url: String, body: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("bifrost routes require Read permission when auth is enabled; " +
      "short admin password logs in verbatim") {
    // password "pw" is far below the default min_password_length=8 —
    // bootstrap must store it unpadded so this login succeeds
    val cfg = GraftConfig(host = "127.0.0.1", httpPort = 0,
      boltEnabled = false, qdrantGrpcEnabled = false,
      adminUser = Some(("admin", "pw")), dataDir = tmpDir("graft-adv"),
      heimdallEnabled = true, heimdallIntervalMs = 24 * 3600 * 1000L)
    val h = GraftServer.boot(spark, cfg)
    try {
      val base = s"http://127.0.0.1:${h.httpPort}"

      // unauthenticated → 401, nothing streams
      val (s1, b1) = get(s"$base/api/bifrost/status")
      assert(s1 == 401, s"unauthenticated bifrost must 401: $s1 $b1")

      // garbage credential → still refused (no openRole downgrade)
      val (s2, _) = get(s"$base/api/bifrost/status", Some("not-a-real-token"))
      assert(s2 == 401)

      // the short configured password authenticates exactly as written
      val (ls, lb) = post(s"$base/auth/token",
        """{"username":"admin","password":"pw","grant_type":"password"}""")
      assert(ls == 200, s"short admin password must log in: $ls $lb")
      val token = """"access_token":"([^"]+)"""".r
        .findFirstMatchIn(lb).map(_.group(1))
      assert(token.isDefined, s"no access_token in $lb")

      // ...and a padded variant (the old bug's stored form) must NOT
      val (ps, _) = post(s"$base/auth/token",
        s"""{"username":"admin","password":"pw${" " * 6}","grant_type":"password"}""")
      assert(ps == 401, "padded password must not authenticate")

      // authenticated admin reaches bifrost
      val (s3, b3) = get(s"$base/api/bifrost/status", token)
      assert(s3 == 200 && b3.contains("\"bifrost\""), s"$s3 $b3")
    } finally h.stop()
  }

  test("TLS enabled but unloadable cert/key fails boot instead of " +
      "starting cleartext listeners") {
    val cfg = GraftConfig(host = "127.0.0.1", httpPort = 0, boltPort = 0,
      adminUser = None, dataDir = tmpDir("graft-tls-fail"),
      qdrantGrpcEnabled = false, heimdallEnabled = false,
      tlsEnabled = true, tlsCertFile = "/nonexistent/cert.pem",
      tlsKeyFile = "/nonexistent/key.pem")
    val e = intercept[IllegalStateException](GraftServer.boot(spark, cfg))
    assert(e.getMessage.contains("tls"))

    val cfg2 = cfg.copy(tlsEnabled = false, httpsEnabled = true,
      tlsCertFile = "", tlsKeyFile = "",
      tlsBaseDirectory = tmpDir("empty-tls-dir"))
    intercept[IllegalStateException](GraftServer.boot(spark, cfg2))
  }

  test("Rbac.resolve: invalid credential refused when credential sources " +
      "exist; openRole only for pure no-auth mode") {
    import ServerAuth._
    // real tokens + openRole: garbage must NOT downgrade to openRole
    val withTokens = Rbac(Map("secret" -> Role.Editor),
      openRole = Some(Role.Viewer))
    assert(withTokens.resolve(Some("secret")).contains(Role.Editor))
    assert(withTokens.resolve(Some("garbage")).isEmpty,
      "invalid credential must be refused, not granted openRole")
    assert(withTokens.resolve(None).contains(Role.Viewer),
      "absent credential still gets the anonymous role")

    // jwt-only Rbac behaves the same
    val withJwt = Rbac(Map.empty, jwtSecret = Some("k".getBytes),
      openRole = Some(Role.Viewer))
    assert(withJwt.resolve(Some("garbage")).isEmpty)

    // pure no-auth read-only mode: every request (credentialed or not)
    // is the capped anonymous role — auth "none" never examines headers
    val open = Rbac(Map.empty, openRole = Some(Role.Viewer),
      maxRole = Some(Role.Viewer))
    assert(open.resolve(Some("stale-token-from-old-config")).contains(Role.Viewer))
    assert(open.resolve(None).contains(Role.Viewer))
  }

  test("rerank encoder degrades to pass-through when the candidate " +
      "collect fails") {
    import spark.implicits._
    // no original_rank column → the select/orderBy inside the encoder
    // throws; the documented fallback is cross_score = bi_score
    val df = Seq(("a", "alpha text", 0.9), ("b", "beta text", 0.4))
      .toDF("id", "content", "bi_score")
    val enc = new HttpReranker(
      HttpRerankerConfig("http://127.0.0.1:9/rerank")).encoder
    val out = enc(df, "query").orderBy("id").collect()
    assert(out.length == 2)
    val ci = out(0).fieldIndex("cross_score")
    assert(out(0).getDouble(ci) == 0.9 && out(1).getDouble(ci) == 0.4)
  }
}
