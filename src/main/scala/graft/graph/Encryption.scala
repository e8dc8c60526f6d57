package graft.graph

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Encryption at rest — the JVM counterpart of the reference's
  * `pkg/encryption/encryption.go`: AES-256-GCM authenticated encryption
  * with key versioning, PBKDF2 key derivation (600k iterations, the
  * reference's OWASP default), and the same wire format:
  *
  *   raw:   [4-byte BE key version][12-byte nonce][ciphertext+tag]
  *   text:  Base64(raw)
  *   field: "enc:v{version}:{base64}" for selective field encryption
  *
  * Key versioning enables rotation (`encryption.go:532-558`): new writes
  * use the current key, old versions stay readable until re-encrypted.
  * GCM's 128-bit tag authenticates — tampering throws, it never returns
  * corrupt plaintext.
  *
  * Scope at the storage layer: [[DeltaLog]] log records and field-level
  * column encryption. Parquet DATA files delegate to the storage layer's
  * own at-rest encryption (S3 SSE / HDFS TDE / Parquet modular
  * encryption) — the same delegation as replication (SURVEY 8.10).
  */
object Encryption {

  private val rng = new SecureRandom()

  /** PBKDF2-HMAC-SHA256 → 32-byte AES-256 key (encryption.go:796). */
  def deriveKey(password: String, salt: Array[Byte],
      iterations: Int = 600000): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** Versioned key ring: rotation adds a version, old ones stay readable. */
  final class KeyManager(initial: Array[Byte]) extends Serializable {
    require(initial.length == 32, "AES-256 needs a 32-byte key")
    private var keys = Map(1 -> initial)
    private var cur = 1
    def currentVersion: Int = synchronized(cur)
    def currentKey: (Int, Array[Byte]) = synchronized((cur, keys(cur)))
    def key(version: Int): Array[Byte] = synchronized(
      keys.getOrElse(version,
        throw new IllegalArgumentException(s"unknown key version $version")))
    def rotate(newKey: Array[Byte]): Int = synchronized {
      require(newKey.length == 32, "AES-256 needs a 32-byte key")
      cur += 1
      keys += (cur -> newKey)
      cur
    }
  }

  def encryptRaw(plain: Array[Byte], version: Int, key: Array[Byte]): Array[Byte] = {
    val nonce = new Array[Byte](12)
    rng.nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, nonce))
    val ct = cipher.doFinal(plain)
    ByteBuffer.allocate(4 + 12 + ct.length)
      .putInt(version).put(nonce).put(ct).array()
  }

  def decryptRaw(data: Array[Byte], keyFor: Int => Array[Byte]): Array[Byte] = {
    require(data.length > 16, "ciphertext too short")
    val buf = ByteBuffer.wrap(data)
    val version = buf.getInt
    val nonce = new Array[Byte](12)
    buf.get(nonce)
    val ct = new Array[Byte](buf.remaining())
    buf.get(ct)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyFor(version), "AES"),
      new GCMParameterSpec(128, nonce))
    cipher.doFinal(ct) // AEADBadTagException on tampering
  }

  /** The reference's Encryptor: base64 text forms, `enabled=false` is a
    * transparent base64 passthrough (encryption.go:1103-1130).
    */
  final class Encryptor(val km: KeyManager, val enabled: Boolean = true)
      extends Serializable {

    def encryptString(plain: String): String = {
      val bytes = plain.getBytes(StandardCharsets.UTF_8)
      if (!enabled) Base64.getEncoder.encodeToString(bytes)
      else {
        val (v, k) = km.currentKey
        Base64.getEncoder.encodeToString(encryptRaw(bytes, v, k))
      }
    }

    def decryptString(cipherText: String): String = {
      val data = Base64.getDecoder.decode(cipherText)
      val plain = if (!enabled) data else decryptRaw(data, km.key)
      new String(plain, StandardCharsets.UTF_8)
    }

    /** Selective field form `enc:v{version}:{base64}`; non-encrypted
      * values pass through unchanged on decrypt (format preservation,
      * encryption.go:541-544).
      */
    def encryptField(value: String): String = {
      val (v, k) = km.currentKey
      val raw = encryptRaw(value.getBytes(StandardCharsets.UTF_8), v, k)
      s"enc:v$v:${Base64.getEncoder.encodeToString(raw)}"
    }

    def decryptField(value: String): String = value match {
      case s if s != null && s.startsWith("enc:v") =>
        val b64 = s.substring(s.indexOf(':', 5) + 1)
        new String(decryptRaw(Base64.getDecoder.decode(b64), km.key),
          StandardCharsets.UTF_8)
      case other => other
    }

    /** Column forms for field-level PII encryption (the privacy surface's
      * at-rest complement). Non-codegen by nature (crypto per value) —
      * point these at the PII columns, not hot analytic paths.
      */
    def encryptCol(c: Column): Column = {
      val self = this
      udf((s: String) => if (s == null) null else self.encryptField(s)).apply(c)
    }
    def decryptCol(c: Column): Column = {
      val self = this
      udf((s: String) => if (s == null) null else self.decryptField(s)).apply(c)
    }
  }
}
