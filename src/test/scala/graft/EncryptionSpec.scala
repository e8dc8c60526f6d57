package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{DeltaLog, Encryption}

/** AES-256-GCM at-rest encryption (`pkg/encryption/encryption.go`):
  * wire-format round-trips, authentication, key versioning/rotation,
  * field-level forms, and the DeltaLog log-record integration.
  */
class EncryptionSpec extends AnyFunSuite {
  import TestSpark._

  private def km() = new Encryption.KeyManager(
    Encryption.deriveKey("correct horse battery staple",
      "pepper".getBytes("UTF-8"), iterations = 1000)) // fast for tests

  test("PBKDF2 derivation is deterministic and salt-sensitive") {
    val a = Encryption.deriveKey("pw", "salt1".getBytes, 1000)
    val b = Encryption.deriveKey("pw", "salt1".getBytes, 1000)
    val c = Encryption.deriveKey("pw", "salt2".getBytes, 1000)
    assert(a.toSeq == b.toSeq && a.toSeq != c.toSeq && a.length == 32)
  }

  test("encrypt/decrypt round-trip; tampering is detected, not returned") {
    val e = new Encryption.Encryptor(km())
    val ct = e.encryptString("""{"version":7,"kind":"delta"}""")
    assert(!ct.contains("delta")) // actually encrypted
    assert(e.decryptString(ct) == """{"version":7,"kind":"delta"}""")
    // flip one ciphertext byte → GCM tag rejects
    val raw = java.util.Base64.getDecoder.decode(ct)
    raw(raw.length - 3) = (raw(raw.length - 3) ^ 0x01).toByte
    val bad = java.util.Base64.getEncoder.encodeToString(raw)
    intercept[Exception](e.decryptString(bad))
    // nondeterministic nonce: same plaintext, different ciphertext
    assert(e.encryptString("x") != e.encryptString("x"))
  }

  test("key rotation: old versions stay readable, unknown versions refuse") {
    val m = km()
    val e = new Encryption.Encryptor(m)
    val v1ct = e.encryptString("old data")
    m.rotate(Encryption.deriveKey("new-password", "s".getBytes, 1000))
    val v2ct = e.encryptString("new data")
    assert(e.decryptString(v1ct) == "old data") // v1 still readable
    assert(e.decryptString(v2ct) == "new data")
    assert(m.currentVersion == 2)
    intercept[IllegalArgumentException](m.key(9))
  }

  test("field form enc:v{n}:{b64}; plaintext passes through on decrypt") {
    val e = new Encryption.Encryptor(km())
    val f = e.encryptField("alice@example.com")
    assert(f.startsWith("enc:v1:"))
    assert(e.decryptField(f) == "alice@example.com")
    assert(e.decryptField("not encrypted") == "not encrypted")
    // disabled encryptor = transparent base64 passthrough
    val off = new Encryption.Encryptor(km(), enabled = false)
    assert(off.decryptString(off.encryptString("plain")) == "plain")
  }

  test("column-level field encryption round-trips through a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = new Encryption.Encryptor(km())
    val df = Seq((1L, "alice@x.com"), (2L, "bob@y.org"), (3L, null))
      .toDF("id", "email")
    val enc = df.withColumn("email", e.encryptCol(col("email")))
    val encRows = enc.collect().map(_.getAs[String]("email"))
    assert(encRows.filter(_ != null).forall(_.startsWith("enc:v1:")))
    val back = enc.withColumn("email", e.decryptCol(col("email")))
      .orderBy("id").collect().map(_.getAs[String]("email"))
    assert(back.toSeq == Seq("alice@x.com", "bob@y.org", null))
  }

  test("DeltaLog: encrypted log records round-trip; plaintext logs stay readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("enc_wal").toString
    val e = new Encryption.Encryptor(km())
    val log = new DeltaLog(spark, dir, Some(e))
    log.commitDelta(0, Map("nodes_upserts" -> Seq((1L, "a")).toDF("id", "v")))
    log.commitDelta(1, Map("nodes_upserts" -> Seq((2L, "b")).toDF("id", "v")))
    // on-disk records are ciphertext, not JSON
    val files = new java.io.File(s"$dir/_log").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(!s.contains("version") && !s.startsWith("{"), s"plaintext leaked: $s")
    }
    // a fresh DeltaLog with the same key ring reads them back
    val log2 = new DeltaLog(spark, dir, Some(e))
    assert(log2.commits().map(_.version) == Seq(0L, 1L))
    assert(log2.commits().forall(_.kind == "delta"))
    // upgrade path: a PLAINTEXT record from before encryption was enabled
    // coexists (format sniff)
    val plain = new DeltaLog(spark, dir, None)
    plain.commitDelta(2, Map("nodes_upserts" -> Seq((3L, "c")).toDF("id", "v")))
    assert(new DeltaLog(spark, dir, Some(e)).commits().map(_.version) ==
      Seq(0L, 1L, 2L))
  }
}
