package graft

import java.net.{InetSocketAddress, URI, URLDecoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.{Authenticator, HttpTxServer, OAuthClient, OAuthConfig}
import graft.sources.ServerAuth.Role

/** OAuth 2.0 authorization-code flow end-to-end against a local
  * stand-in provider serving the reference dev provider's endpoints
  * (`/root/reference/cmd/oauth-provider/main.go`:
  * `/oauth2/v1/{token,userinfo}`): redirect URL + CSRF state, code →
  * token exchange with the client secret, userinfo → find-or-create
  * local account with mapped roles, engine JWT in the browser cookie
  * (`pkg/auth/oauth.go` HandleCallback).
  */
class OAuthSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  /** Minimal provider: one valid code, one bearer token, one user. */
  private def fakeProvider(): (HttpServer, Int) = {
    val srv = HttpServer.create(new InetSocketAddress(0), 0)
    srv.createContext("/oauth2/v1/token", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val form = body.split('&').map(_.split("=", 2)).collect {
        case Array(k, v) => k -> URLDecoder.decode(v, "UTF-8")
      }.toMap
      val resp =
        if (form.get("grant_type").contains("authorization_code") &&
            form.get("code").contains("good-code") &&
            form.get("client_secret").contains("local-test-secret-123"))
          (200, """{"access_token":"at-dana-1","token_type":"Bearer","expires_in":3600}""")
        else (401, """{"error":"invalid_grant"}""")
      val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(resp._1, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.createContext("/oauth2/v1/userinfo", { ex =>
      val ok = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains("Bearer at-dana-1")
      val resp =
        if (ok)
          (200, """{"sub":"oauth-sub-1","email":"dana@example.com","preferred_username":"dana","roles":["developer"]}""")
        else (401, """{"error":"invalid_token"}""")
      val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(resp._1, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    (srv, srv.getAddress.getPort)
  }

  private def get(port: Int, path: String,
      bearer: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("authorization-code flow: redirect, callback, account, JWT role") {
    val (provider, providerPort) = fakeProvider()
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val secret = "oauth-flow-jwt-secret-32-chars!!".getBytes("UTF-8")
    val auth = new Authenticator(secret)
    val oauth = new OAuthClient(OAuthConfig(
      issuer = s"http://127.0.0.1:$providerPort",
      clientId = "nornicdb-local-test",
      clientSecret = "local-test-secret-123",
      callbackUrl = "http://localhost:7474/auth/oauth/callback"), auth)
    val server = new HttpTxServer(store, rbac = Some(auth.rbac()),
      authenticator = Some(auth), oauth = Some(oauth)).start()
    try {
      val p = server.boundPort
      // UI bootstrap discloses the provider
      assert(get(p, "/auth/config").body()
        .contains("\"oauthProviders\":[\"oauth\"]"))
      // redirect: 302 to the provider's authorize URL with a state
      val redir = get(p, "/auth/oauth/redirect")
      assert(redir.statusCode() == 302)
      val loc = redir.headers().firstValue("Location").orElse("")
      assert(loc.startsWith(s"http://127.0.0.1:$providerPort/oauth2/v1/authorize?") &&
        loc.contains("client_id=nornicdb-local-test") &&
        loc.contains("response_type=code") &&
        loc.contains("scope=openid+profile+email"), loc)
      val state = "state=([^&]+)".r.findFirstMatchIn(loc).get.group(1)

      // callback errors: provider error param, missing code, bad state
      assert(get(p, "/auth/oauth/callback?error=access_denied&error_description=no").statusCode() == 400)
      assert(get(p, "/auth/oauth/callback?state=x").statusCode() == 400)
      val badState = get(p, s"/auth/oauth/callback?code=good-code&state=forged")
      assert(badState.statusCode() == 400 &&
        badState.body().contains("invalid state"), badState.body())

      // the real callback: cookie + redirect to the UI root
      val cb = get(p, s"/auth/oauth/callback?code=good-code&state=$state")
      assert(cb.statusCode() == 302 &&
        cb.headers().firstValue("Location").orElse("") == "/", cb.body())
      val cookie = cb.headers().allValues("Set-Cookie").toString
      assert(cookie.contains("nornicdb_token=") && cookie.contains("HttpOnly"),
        cookie)
      val jwt = "nornicdb_token=([^;]+)".r.findFirstMatchIn(cookie).get.group(1)

      // state is single-use
      assert(get(p, s"/auth/oauth/callback?code=good-code&state=$state")
        .statusCode() == 400)
      // a bogus code fails the exchange
      val r2 = get(p, "/auth/oauth/redirect")
      val state2 = "state=([^&]+)".r.findFirstMatchIn(
        r2.headers().firstValue("Location").orElse("")).get.group(1)
      val badCode = get(p, s"/auth/oauth/callback?code=evil&state=$state2")
      assert(badCode.statusCode() == 400 &&
        badCode.body().contains("failed to exchange code"), badCode.body())

      // the account exists with the developer→editor mapping
      val u = auth.getUser("dana").get
      assert(u.roles == Seq(Role.Editor) && u.email == "dana@example.com")
      assert(u.metadata.get("auth_method").contains("oauth") &&
        u.metadata.get("oauth_access_token").contains("at-dana-1"), u.metadata)

      // the minted JWT carries editor rights on the tx endpoint
      val w = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/db/neo4j/tx/commit"))
        .header("Authorization", s"Bearer $jwt")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"statements":[{"statement":"CREATE (n:OAuthSpec {key: 1})"}]}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(w.statusCode() == 200 && w.body().contains(""""errors":[]"""),
        w.body())
      assert(store.snapshot.nodes.count() == 1)
      // /auth/me reflects the oauth identity
      val me = get(p, "/auth/me", Some(jwt)).body()
      assert(me.contains("\"username\":\"dana\"") &&
        me.contains("\"auth_method\":\"oauth\""), me)
    } finally {
      server.stop()
      provider.stop(0)
    }
  }
}
