package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.HttpExchange

/** Authentication + role-based authorization shared by the server loops
  * (HTTP-tx, MCP, GraphQL, Qdrant-gRPC, Bolt) — the counterpart of the
  * reference's auth package (`/root/reference/pkg/auth/auth.go:154-226`):
  * four roles (admin/editor/viewer/none), seven permissions, token→role
  * resolution from static API tokens or HS256 JWTs, constant-time
  * credential comparison.
  *
  * Semantics mirror the reference:
  *  - no/invalid credentials → UNAUTHENTICATED (HTTP 401 / grpc 16 / Bolt
  *    `Security.Unauthorized`);
  *  - valid credentials lacking the operation's permission → FORBIDDEN
  *    (HTTP 403 / grpc 7 / Bolt `Security.Forbidden`, server_db.go:656);
  *  - no auth configured → open dev mode (`--auth-disabled` escape hatch).
  */
object ServerAuth {

  /** auth.go:158-166 — predefined roles. */
  sealed abstract class Role(val name: String)
  object Role {
    case object Admin extends Role("admin")
    case object Editor extends Role("editor")
    case object Viewer extends Role("viewer")
    case object NoAccess extends Role("none")
    val all: Seq[Role] = Seq(Admin, Editor, Viewer, NoAccess)
    def parse(s: String): Option[Role] = all.find(_.name == s.trim.toLowerCase)
  }

  /** auth.go:169-179 — Neo4j-compatible actions. */
  sealed abstract class Permission(val name: String)
  object Permission {
    case object Read extends Permission("read")
    case object Write extends Permission("write")
    case object Create extends Permission("create")
    case object Delete extends Permission("delete")
    case object Admin extends Permission("admin")
    case object Schema extends Permission("schema")
    case object UserManage extends Permission("user_manage")
  }

  /** auth.go:183-188 — RolePermissions. */
  val rolePermissions: Map[Role, Set[Permission]] = {
    import Permission._
    Map(
      Role.Admin -> Set(Read, Write, Create, Delete, Admin, Schema, UserManage),
      Role.Editor -> Set[Permission](Read, Write, Create, Delete),
      Role.Viewer -> Set[Permission](Read),
      Role.NoAccess -> Set.empty[Permission])
  }

  def can(role: Role, p: Permission): Boolean = rolePermissions(role).contains(p)

  /** Shared JSON string-field extraction with full unescaping — the one
    * helper every server-side regex field read goes through, so a
    * password containing a quote or backslash hashes to the same bytes
    * on every endpoint that reads it.
    */
  private[sources] def strField(body: String, key: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body).map(m => unescapeJson(m.group(1)))

  private[sources] def unescapeJson(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Token→role RBAC config. Static API tokens map directly to a role;
    * when `jwtSecret` is set, HS256 JWTs with a `roles` claim are also
    * accepted (auth.go JWT validation — signature, exp, roles).
    */
  final case class Rbac(tokens: Map[String, Role],
      jwtSecret: Option[Array[Byte]] = None,
      maxRole: Option[Role] = None,
      openRole: Option[Role] = None) {

    /** `maxRole` caps every resolved credential — the server's read-only
      * mode (NORNICDB_READ_ONLY, config.go:116 "prevents all write
      * operations") sets Viewer here so admins keep reading but nobody
      * writes, on every surface that shares this Rbac.
      */
    private def cap(r: Role): Role = maxRole match {
      case Some(m) =>
        val rank = Map[Role, Int](Role.Admin -> 3, Role.Editor -> 2,
          Role.Viewer -> 1, Role.NoAccess -> 0)
        if (rank(r) > rank(m)) m else r
      case None => r
    }

    /** Resolve a presented credential to a role; None = unauthenticated.
      * Every static token is compared (constant-time, no early exit on
      * the match) so timing doesn't leak which token prefix matched.
      */
    def resolve(cred: Option[String]): Option[Role] = cred match {
      case Some(c) =>
        var found: Option[Role] = None
        tokens.foreach { case (t, r) =>
          if (constantTimeEq(c, t)) found = Some(r)
        }
        found.orElse(jwtSecret.flatMap(validateJwt(_, c)))
          // openRole stands in for a PRESENTED-but-unmatched credential
          // only when this Rbac has no credential source at all (auth
          // "none", where Authorization headers are never examined —
          // config.go:116); a server with real tokens/JWT must refuse an
          // invalid credential, never downgrade it to the anonymous role
          .orElse(if (tokens.isEmpty && jwtSecret.isEmpty) openRole else None)
          .map(cap)
      // no credential presented: the anonymous role (when configured)
      case None => openRole.map(cap)
    }
  }
  object Rbac {
    /** Back-compat: a bare server token is an admin credential. */
    def legacy(token: Option[String]): Option[Rbac] =
      token.map(t => Rbac(Map(t -> Role.Admin)))
  }

  /** Strongest role wins when a JWT carries several (auth.go users may
    * hold multiple roles; permissions are the union).
    */
  private def strongest(roles: Seq[Role]): Role =
    Seq(Role.Admin, Role.Editor, Role.Viewer).find(roles.contains)
      .getOrElse(Role.NoAccess)

  private val b64url = Base64.getUrlEncoder.withoutPadding
  private val b64urlDec = Base64.getUrlDecoder

  private def hs256(secret: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    mac.doFinal(data)
  }

  /** Mint an HS256 JWT with `sub` + `roles` claims (auth.go token shape).
    * `expEpochSec <= 0` means no expiry (the reference omits `exp` for
    * never-expiring tokens).
    */
  def mintJwt(secret: Array[Byte], username: String, roles: Seq[Role],
      expEpochSec: Long = 0L): String = {
    val header = b64url.encodeToString(
      """{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val exp = if (expEpochSec > 0) s""","exp":$expEpochSec""" else ""
    // sub may come from an external identity provider — JSON-escape it
    // so a quote in a username can't break (or inject into) the payload
    val sub = username.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val payload = b64url.encodeToString(
      (s"""{"sub":"$sub","roles":[${roles.map(r => "\"" + r.name + "\"")
        .mkString(",")}]$exp}""").getBytes(StandardCharsets.UTF_8))
    val signed = s"$header.$payload"
    val sig = b64url.encodeToString(
      hs256(secret, signed.getBytes(StandardCharsets.UTF_8)))
    s"$signed.$sig"
  }

  /** Validate an HS256 JWT: signature (constant-time), optional `exp`,
    * then resolve the strongest of its `roles` claim.
    */
  def validateJwt(secret: Array[Byte], token: String): Option[Role] = {
    val parts = token.split('.')
    if (parts.length != 3) return None
    try {
      val expected = hs256(secret,
        s"${parts(0)}.${parts(1)}".getBytes(StandardCharsets.UTF_8))
      val given = b64urlDec.decode(parts(2))
      if (!java.security.MessageDigest.isEqual(expected, given)) return None
      val payload = new String(b64urlDec.decode(parts(1)), StandardCharsets.UTF_8)
      graft.functions.JsonImpls.parse(payload).filter(_.isObject).flatMap { n =>
        val expOk = !n.has("exp") ||
          n.get("exp").asLong() > System.currentTimeMillis() / 1000
        if (!expOk) None
        else {
          import scala.jdk.CollectionConverters._
          val roles = Option(n.get("roles")).filter(_.isArray).toSeq
            .flatMap(_.elements().asScala)
            .flatMap(e => Role.parse(e.asText()))
          Some(strongest(roles))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Credential from an HTTP exchange — the reference's four sources in
    * precedence order (auth.go:1800-1805, extractTokenFromMetadata in
    * qdrantgrpc/server.go:613-636): Authorization Bearer header,
    * X-API-Key header, the `nornicdb_token` browser cookie
    * (server_auth.go:66-75), and `access_token`/`api_key` query params.
    */
  def credential(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer "))
      .map(_.substring("Bearer ".length))
      .orElse(Option(ex.getRequestHeaders.getFirst("X-API-Key")))
      .orElse(cookieToken(ex))
      .orElse(queryToken(ex))

  private def cookieToken(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Cookie")).flatMap { c =>
      c.split(';').map(_.trim).collectFirst {
        case kv if kv.startsWith("nornicdb_token=") =>
          kv.substring("nornicdb_token=".length)
      }
    }

  private def queryToken(ex: HttpExchange): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap { q =>
      q.split('&').collectFirst {
        case kv if kv.startsWith("access_token=") || kv.startsWith("api_key=") =>
          java.net.URLDecoder.decode(kv.substring(kv.indexOf('=') + 1), "UTF-8")
      }
    }

  /** Resolve this request's role. `None` rbac = open dev mode → Admin.
    * `Some(None)` from resolve = unauthenticated.
    */
  def roleOf(ex: HttpExchange, rbac: Option[Rbac]): Option[Role] =
    rbac match {
      case None => Some(Role.Admin)
      case Some(r) => r.resolve(credential(ex))
    }

  /** The authenticated subject (JWT `sub` claim) behind this request —
    * the reference's getClaims(r).Sub (server_middleware.go). Static API
    * tokens and open dev mode carry no user identity → None; callers
    * treat that as the anonymous/admin case the reference special-cases.
    * The signature is verified before the claim is trusted.
    */
  def subjectOf(ex: HttpExchange, rbac: Option[Rbac]): Option[String] =
    for {
      r <- rbac
      secret <- r.jwtSecret
      cred <- credential(ex)
      if validateJwt(secret, cred).isDefined // signature + exp first
      parts = cred.split('.')
      if parts.length == 3
      payload = new String(b64urlDec.decode(parts(1)), StandardCharsets.UTF_8)
      node <- graft.functions.JsonImpls.parse(payload).filter(_.isObject)
      sub <- Option(node.get("sub")).map(_.asText()).filter(_.nonEmpty)
    } yield sub

  def bearerOk(ex: HttpExchange, token: Option[String]): Boolean =
    token.forall { t =>
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(constantTimeEq(_, s"Bearer $t"))
    }

  /** Extract `credentials` from a Bolt HELLO/LOGON auth map. */
  def boltCredentials(fields: Seq[_]): Option[String] = fields.headOption match {
    case Some(m: Map[_, _]) =>
      m.asInstanceOf[Map[String, Any]].get("credentials").map(String.valueOf)
    case _ => None
  }

  /** Length-safe constant-time comparison (auth.go compares token hashes;
    * the point is not leaking prefix length through timing).
    */
  def constantTimeEq(a: String, b: String): Boolean = {
    val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
    java.security.MessageDigest.isEqual(ab, bb)
  }
}
