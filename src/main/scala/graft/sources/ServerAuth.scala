package graft.sources

import com.sun.net.httpserver.HttpExchange

/** Shared bearer-token gate for the HTTP-based server loops (HTTP-tx, MCP,
  * GraphQL) — the minimal counterpart of the reference's token check
  * (`/root/reference/pkg/auth/auth.go`: every request must present a valid
  * token; the reference refuses unauthenticated connections by default).
  * `token = None` leaves the endpoint open (dev mode), matching the
  * reference's `--auth-disabled` escape hatch.
  */
object ServerAuth {
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
