package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.SecureRandom
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.util.Base64

import scala.collection.concurrent.TrieMap

import graft.functions.JsonImpls
import graft.sources.ServerAuth.Role

/** OAuth 2.0 authorization-code flow against an external provider —
  * behavioral spec `/root/reference/pkg/auth/oauth.go` (flow comment at
  * the top of that file: authorize → code → token exchange → userinfo →
  * find-or-create local account → mint engine JWT) and the endpoint
  * paths its own dev provider serves (`cmd/oauth-provider/main.go`):
  * `/oauth2/v1/{authorize,token,userinfo}` under the issuer.
  *
  * Security properties preserved from the reference: the `state`
  * parameter is single-use with a 10-minute TTL (CSRF protection,
  * oauth.go:143-162), the client secret only travels in the
  * back-channel token exchange, and the engine JWT's lifetime is
  * clamped to [1 h, 24 h] around the provider token's expiry
  * (oauth.go:325-333).
  */
final case class OAuthConfig(issuer: String, clientId: String,
    clientSecret: String, callbackUrl: String) {
  def isConfigured: Boolean =
    issuer.nonEmpty && clientId.nonEmpty && clientSecret.nonEmpty &&
      callbackUrl.nonEmpty
}

object OAuthConfig {
  /** The reference's environment configuration (oauth.go:99-112):
    * active only when NORNICDB_AUTH_PROVIDER=oauth.
    */
  def fromEnv(env: String => Option[String] = k => sys.env.get(k)): Option[OAuthConfig] =
    env("NORNICDB_AUTH_PROVIDER").filter(_ == "oauth").map { _ =>
      OAuthConfig(
        env("NORNICDB_OAUTH_ISSUER").getOrElse(""),
        env("NORNICDB_OAUTH_CLIENT_ID").getOrElse(""),
        env("NORNICDB_OAUTH_CLIENT_SECRET").getOrElse(""),
        env("NORNICDB_OAUTH_CALLBACK_URL").getOrElse(""))
    }.filter(_.isConfigured)
}

final class OAuthClient(config: OAuthConfig, authenticator: Authenticator) {
  require(config.isConfigured, "OAuth configuration incomplete")

  final case class TokenData(accessToken: String, expiresIn: Long,
      refreshToken: Option[String])
  final case class UserInfo(sub: String, email: String,
      preferredUsername: String, roles: Seq[String])

  private val http = HttpClient.newHttpClient()
  private val rng = new SecureRandom()
  private val states = TrieMap.empty[String, Long] // state → expiry millis
  private val stateTtlMs = 10 * 60 * 1000L

  // ============================================================ flow ====

  /** Authorization URL + stored CSRF state (oauth.go:117-140). */
  def generateAuthUrl(): (String, String) = {
    val raw = new Array[Byte](24)
    rng.nextBytes(raw)
    val state = Base64.getUrlEncoder.withoutPadding.encodeToString(raw)
    states.put(state, System.currentTimeMillis() + stateTtlMs)
    // opportunistic cleanup of expired states
    val now = System.currentTimeMillis()
    states.filterInPlace((_, exp) => exp > now)
    def q(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val url = s"${config.issuer}/oauth2/v1/authorize?response_type=code" +
      s"&client_id=${q(config.clientId)}&redirect_uri=${q(config.callbackUrl)}" +
      s"&state=${q(state)}&scope=${q("openid profile email")}"
    (state, url)
  }

  /** One-time state validation (oauth.go:143-162). */
  def validateState(state: String): Either[String, Unit] =
    states.remove(state) match {
      case None => Left("state not found or expired")
      case Some(exp) if exp < System.currentTimeMillis() => Left("state expired")
      case Some(_) => Right(())
    }

  private def form(fields: (String, String)*): String =
    fields.map { case (k, v) =>
      s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }.mkString("&")

  private def parseToken(body: String): Either[String, TokenData] =
    JsonImpls.parse(body).filter(_.isObject) match {
      case None => Left(s"failed to parse token response: $body")
      case Some(n) =>
        Option(n.get("access_token")).map(_.asText()).filter(_.nonEmpty) match {
          case None => Left(s"token response missing access_token: $body")
          case Some(at) => Right(TokenData(at,
            Option(n.get("expires_in")).map(_.asLong()).getOrElse(0L),
            Option(n.get("refresh_token")).map(_.asText()).filter(_.nonEmpty)))
        }
    }

  /** Back-channel code → token exchange (oauth.go:176-210). */
  def exchangeCode(code: String): Either[String, TokenData] = {
    val req = HttpRequest.newBuilder(URI.create(s"${config.issuer}/oauth2/v1/token"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form(
        "grant_type" -> "authorization_code", "code" -> code,
        "redirect_uri" -> config.callbackUrl,
        "client_id" -> config.clientId,
        "client_secret" -> config.clientSecret)))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      Left(s"token exchange failed: status ${resp.statusCode()}, body: ${resp.body()}")
    else parseToken(resp.body())
  }

  /** Provider userinfo (oauth.go:213-244). */
  def userInfo(accessToken: String): Either[String, UserInfo] = {
    val req = HttpRequest.newBuilder(URI.create(s"${config.issuer}/oauth2/v1/userinfo"))
      .header("Authorization", s"Bearer $accessToken").GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      Left(s"userinfo request failed: status ${resp.statusCode()}, body: ${resp.body()}")
    else JsonImpls.parse(resp.body()).filter(_.isObject) match {
      case None => Left(s"failed to parse userinfo: ${resp.body()}")
      case Some(n) =>
        def str(k: String) = Option(n.get(k)).map(_.asText()).getOrElse("")
        val roles = Option(n.get("roles")).filter(_.isArray).toSeq
          .flatMap(a => (0 until a.size()).map(i => a.get(i).asText()))
        Right(UserInfo(str("sub"), str("email"), str("preferred_username"), roles))
    }
  }

  /** OAuth role strings → engine roles (ConvertOAuthRoles,
    * oauth.go:449-470): developer maps to editor; no roles → viewer.
    */
  def convertRoles(roles: Seq[String]): Seq[Role] = {
    val mapped = roles.flatMap(_.toLowerCase match {
      case "admin" => Some(Role.Admin)
      case "developer" | "editor" => Some(Role.Editor)
      case "viewer" => Some(Role.Viewer)
      case _ => None
    })
    if (mapped.isEmpty) Seq(Role.Viewer) else mapped
  }

  /** The full callback: state → exchange → userinfo → find-or-create →
    * metadata persist → engine JWT (HandleCallback, oauth.go:246-340).
    * Returns (username, engine JWT).
    */
  def handleCallback(code: String, state: String): Either[String, (String, String)] =
    for {
      _ <- validateState(state).left.map(e => s"invalid state: $e")
      token <- exchangeCode(code).left.map(e => s"failed to exchange code: $e")
      info <- userInfo(token.accessToken).left.map(e => s"failed to get userinfo: $e")
      username <- Seq(info.preferredUsername, info.email, info.sub)
        .find(_.nonEmpty).toRight("userinfo carries no usable identity")
    } yield {
      if (authenticator.getUser(username).isEmpty) {
        // OAuth users authenticate upstream: local password is random
        val pw = new Array[Byte](24)
        rng.nextBytes(pw)
        authenticator.createUser(username,
          Base64.getUrlEncoder.encodeToString(pw), convertRoles(info.roles))
      }
      val expSec = if (token.expiresIn > 0) token.expiresIn else 3600L
      val expiry = Instant.now().plusSeconds(expSec)
      authenticator.updateProfile(username,
        Some(info.email).filter(_.nonEmpty),
        Map("auth_method" -> "oauth",
          "oauth_access_token" -> token.accessToken,
          "oauth_token_expiry" -> DateTimeFormatter.ISO_OFFSET_DATE_TIME
            .format(ZonedDateTime.ofInstant(expiry, ZoneOffset.UTC))) ++
          token.refreshToken.map("oauth_refresh_token" -> _))
      // engine-token lifetime: provider expiry clamped to [1h, 24h]
      val ttlSec = math.max(3600L, math.min(expSec, 86400L))
      val roles = authenticator.getUser(username).map(_.roles)
        .getOrElse(convertRoles(info.roles))
      val jwt = authenticator.mintApiToken(username, roles,
        Instant.now().getEpochSecond + ttlSec)
      (username, jwt)
    }
}
