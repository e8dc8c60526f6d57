package graft.sources

import java.nio.charset.StandardCharsets
import java.security.SecureRandom

import scala.collection.concurrent.TrieMap

import graft.sources.ServerAuth.Role

/** User accounts + password login + JWT minting — the reference's
  * Authenticator (`/root/reference/pkg/auth/auth.go:544-1100`): user
  * management with per-user roles, password policy, account lockout
  * after N failed attempts (default 5 / 15 min), disabled accounts, and
  * an audit hook. Passwords hash with PBKDF2-HMAC-SHA256 + per-user
  * salt (the JDK-available analog of the reference's bcrypt — same
  * adaptive-cost property via the iteration count).
  *
  * Login semantics mirror auth.go:970-1100 exactly:
  *  - unknown user → invalid credentials (never reveal existence);
  *  - locked account → its own error (HTTP 429 on the token endpoint);
  *  - disabled account → invalid credentials;
  *  - wrong password → failed-login counter, lock at the threshold;
  *  - success → counter reset, HS256 JWT with the user's roles + exp
  *    (the token resolves through [[ServerAuth.Rbac]] on every server).
  */
final class Authenticator(jwtSecret: Array[Byte],
    minPasswordLength: Int = 8,
    maxFailedLogins: Int = 5,
    lockoutDurationMs: Long = 15 * 60 * 1000L,
    tokenTtlSec: Long = 3600L,
    pbkdf2Iterations: Int = 100000) {

  require(jwtSecret.length >= 16, "JWT secret too short")

  sealed trait AuthError { def message: String }
  case object InvalidCredentials extends AuthError {
    val message = "invalid credentials"
  }
  case object AccountLocked extends AuthError {
    val message = "account locked due to failed login attempts"
  }
  final case class PolicyViolation(message: String) extends AuthError

  /** RFC 6749 token response shape (auth.go OAuth compatibility note). */
  final case class TokenResponse(accessToken: String,
      tokenType: String = "Bearer", expiresIn: Long = 0L)

  final case class AuditEvent(eventType: String, username: String,
      success: Boolean, details: String)

  /** Audit hook (HIPAA/GDPR logging requirement — SetAuditLogger). */
  @volatile var auditLogger: AuditEvent => Unit = _ => ()

  private final class Account(
      @volatile var salt: Array[Byte], @volatile var hash: Array[Byte],
      @volatile var roles: Seq[Role],
      @volatile var failedLogins: Int = 0,
      @volatile var lockedUntil: Long = 0L,
      @volatile var disabled: Boolean = false,
      @volatile var email: String = "",
      @volatile var metadata: Map[String, String] = Map.empty)

  private val users = TrieMap.empty[String, Account]
  private val rng = new SecureRandom()

  private def pbkdf2(password: String, salt: Array[Byte]): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, pbkdf2Iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** `bypassPolicy` lets the server bootstrap skip the length floor for
    * the configured admin account (the reference's main.go CreateUser
    * path does the same for its default "password"); every user-facing
    * route keeps the default `false`.
    */
  def createUser(username: String, password: String, roles: Seq[Role],
      bypassPolicy: Boolean = false): Either[AuthError, Unit] = {
    if (!bypassPolicy && password.length < minPasswordLength)
      return Left(PolicyViolation(
        s"password does not meet minimum length requirement ($minPasswordLength)"))
    if (users.contains(username))
      return Left(PolicyViolation("user already exists"))
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    users(username) = new Account(salt, pbkdf2(password, salt), roles)
    Right(())
  }

  def setDisabled(username: String, disabled: Boolean): Boolean =
    users.get(username) match {
      case Some(a) => a.disabled = disabled; true
      case None => false
    }

  def setRoles(username: String, roles: Seq[Role]): Boolean =
    users.get(username) match {
      case Some(a) => a.roles = roles; true
      case None => false
    }

  def authenticate(username: String,
      password: String): Either[AuthError, TokenResponse] = {
    def audit(ok: Boolean, details: String): Unit =
      auditLogger(AuditEvent("login", username, ok, details))
    users.get(username) match {
      case None =>
        audit(ok = false, "user not found")
        Left(InvalidCredentials) // never reveal whether the user exists
      case Some(a) =>
        val now = System.currentTimeMillis()
        if (a.lockedUntil > now) {
          audit(ok = false, "account locked")
          Left(AccountLocked)
        } else if (a.disabled) {
          audit(ok = false, "account disabled")
          Left(InvalidCredentials)
        } else {
          // read the (salt, hash) pair under the account lock: a
          // concurrent changePassword swaps both together, and a torn
          // read (new hash, old salt) would spuriously fail the login
          val (salt, hash) = a.synchronized((a.salt, a.hash))
          if (!java.security.MessageDigest.isEqual(pbkdf2(password, salt), hash)) {
          a.synchronized {
            a.failedLogins += 1
            if (a.failedLogins >= maxFailedLogins)
              a.lockedUntil = now + lockoutDurationMs
          }
          audit(ok = false, "invalid password")
          Left(InvalidCredentials)
        } else {
          a.synchronized { a.failedLogins = 0; a.lockedUntil = 0L }
          audit(ok = true, "")
          val exp = if (tokenTtlSec > 0) now / 1000 + tokenTtlSec else 0L
          Right(TokenResponse(
            ServerAuth.mintJwt(jwtSecret, username, a.roles, exp),
            expiresIn = tokenTtlSec))
        }
        }
    }
  }

  /** Public user view — never the password hash (auth.go `json:"-"`). */
  final case class UserInfo(username: String, roles: Seq[Role],
      disabled: Boolean, email: String = "",
      metadata: Map[String, String] = Map.empty)

  def listUsers(): Seq[UserInfo] =
    users.toSeq.sortBy(_._1).map { case (n, a) =>
      UserInfo(n, a.roles, a.disabled, a.email, a.metadata)
    }

  def getUser(username: String): Option[UserInfo] =
    users.get(username).map(a =>
      UserInfo(username, a.roles, a.disabled, a.email, a.metadata))

  /** Self-service password change (server_auth.go:444-497 →
    * auth.ChangePassword): the old password must verify — lockout and
    * disabled states behave exactly like a login attempt — and the new
    * one passes the policy before the hash re-derives with a FRESH salt.
    */
  def changePassword(username: String, oldPassword: String,
      newPassword: String): Either[AuthError, Unit] = {
    def audit(ok: Boolean, details: String): Unit =
      auditLogger(AuditEvent("password_change", username, ok, details))
    users.get(username) match {
      case None =>
        audit(ok = false, "user not found")
        Left(InvalidCredentials)
      case Some(a) =>
        val now = System.currentTimeMillis()
        if (a.lockedUntil > now) { audit(ok = false, "locked"); Left(AccountLocked) }
        else if (a.disabled) { audit(ok = false, "disabled"); Left(InvalidCredentials) }
        else if ({ val (salt, hash) = a.synchronized((a.salt, a.hash))
            !java.security.MessageDigest.isEqual(
              pbkdf2(oldPassword, salt), hash) }) {
          a.synchronized {
            a.failedLogins += 1
            if (a.failedLogins >= maxFailedLogins)
              a.lockedUntil = now + lockoutDurationMs
          }
          audit(ok = false, "old password incorrect")
          Left(InvalidCredentials)
        } else if (newPassword.length < minPasswordLength) {
          audit(ok = false, "policy violation")
          Left(PolicyViolation(
            s"password does not meet minimum length requirement ($minPasswordLength)"))
        } else {
          val salt = new Array[Byte](16)
          rng.nextBytes(salt)
          a.synchronized {
            a.salt = salt; a.hash = pbkdf2(newPassword, salt)
            a.failedLogins = 0; a.lockedUntil = 0L
          }
          audit(ok = true, "user changed own password")
          Right(())
        }
    }
  }

  /** Self-service profile update (server_auth.go:499-547 →
    * auth.UpdateUser): email and/or metadata; metadata keys merge over
    * the existing map (empty-string value deletes the key).
    */
  def updateProfile(username: String, email: Option[String],
      metadata: Map[String, String]): Boolean =
    users.get(username) match {
      case Some(a) =>
        email.foreach(a.email = _)
        if (metadata.nonEmpty) a.synchronized {
          val (drop, keep) = metadata.partition(_._2.isEmpty)
          a.metadata = a.metadata -- drop.keys ++ keep
        }
        auditLogger(AuditEvent("profile_update", username, success = true,
          "user updated own profile"))
        true
      case None => false
    }

  def deleteUser(username: String): Boolean = users.remove(username).isDefined

  /** Stateless machine token (GenerateAPIToken, auth.go): a JWT with the
    * given subject + roles, validated by signature only — never stored.
    */
  def mintApiToken(subject: String, roles: Seq[Role],
      expEpochSec: Long = 0L): String =
    ServerAuth.mintJwt(jwtSecret, subject, roles, expEpochSec)

  /** The Rbac every server takes: static API tokens (optional) plus this
    * authenticator's JWTs.
    */
  def rbac(staticTokens: Map[String, Role] = Map.empty): ServerAuth.Rbac =
    ServerAuth.Rbac(staticTokens, Some(jwtSecret))
}
