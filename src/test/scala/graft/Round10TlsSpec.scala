package graft

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.KeyStore
import java.security.cert.X509Certificate
import java.util.Base64

import javax.net.ssl.{SSLContext, SSLSocket, TrustManager, X509TrustManager}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftConfig, PackStream, ServerTls}

/** TLS listeners (reference `server.tls` / `server.https` config,
  * `pkg/config/config.go:218-243`, NORNICDB_TLS_DIR contract): PEM
  * cert/key load into one SSLContext; HTTPS serves the whole HTTP
  * surface, Bolt speaks bolt+s. The test generates real material with the
  * JDK's keytool (PKCS12) and exports it as the PEM pair the config
  * contract expects.
  */
class Round10TlsSpec extends AnyFunSuite {
  import TestSpark._

  /** keytool-generated self-signed RSA pair exported as (cert.pem, key.pem). */
  private def generatePem(dir: File): (String, String) = {
    val ksPath = new File(dir, "srv.p12").getPath
    val keytool = new File(System.getProperty("java.home"), "bin/keytool").getPath
    val cmd = Array(keytool, "-genkeypair", "-alias", "server",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-dname", "CN=localhost", "-ext", "SAN=ip:127.0.0.1,dns:localhost",
      "-keystore", ksPath,
      "-storetype", "PKCS12", "-storepass", "changeit")
    val p = Runtime.getRuntime.exec(cmd)
    assert(p.waitFor() == 0, new String(p.getErrorStream.readAllBytes()))

    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(new File(ksPath).toPath)
    try ks.load(in, "changeit".toCharArray) finally in.close()
    val key = ks.getKey("server", "changeit".toCharArray)
    val cert = ks.getCertificate("server")
    def pem(kind: String, der: Array[Byte]): String =
      s"-----BEGIN $kind-----\n" +
        Base64.getMimeEncoder(64, "\n".getBytes).encodeToString(der) +
        s"\n-----END $kind-----\n"
    val certPath = new File(dir, "public.crt")
    val keyPath = new File(dir, "private.key")
    Files.write(certPath.toPath,
      pem("CERTIFICATE", cert.getEncoded).getBytes(StandardCharsets.UTF_8))
    Files.write(keyPath.toPath,
      pem("PRIVATE KEY", key.getEncoded).getBytes(StandardCharsets.UTF_8))
    (certPath.getPath, keyPath.getPath)
  }

  private val trustAll = Array[TrustManager](new X509TrustManager {
    def getAcceptedIssuers: Array[X509Certificate] = Array.empty
    def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
  })

  private def insecureClientCtx: SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trustAll, new java.security.SecureRandom())
    ctx
  }

  test("PEM load, HTTPS surface, and Bolt over TLS") {
    val dir = Files.createTempDirectory("tls").toFile
    dir.deleteOnExit()
    val (certPath, keyPath) = generatePem(dir)

    // direct material checks
    assert(ServerTls.loadCertificates(
      new String(Files.readAllBytes(new File(certPath).toPath))).nonEmpty)
    assert(ServerTls.loadPrivateKey(
      new String(Files.readAllBytes(new File(keyPath).toPath)))
      .getAlgorithm == "RSA")
    // base-directory resolution (NORNICDB_TLS_DIR: public.crt/private.key)
    assert(ServerTls.fromConfig("", "", dir.getPath).isDefined)

    val data = Files.createTempDirectory("tls-data").toFile.getAbsolutePath
    val cfg = GraftConfig(host = "127.0.0.1", boltPort = 0, httpPort = 0,
      httpsEnabled = true, httpsPort = 0, tlsEnabled = true,
      tlsBaseDirectory = dir.getPath, adminUser = None, dataDir = data,
      qdrantGrpcEnabled = false, heimdallEnabled = false)
    val h = GraftServer.boot(spark, cfg)
    try {
      assert(h.httpsPort > 0 && h.httpPort > 0 && h.boltPort > 0)

      // HTTPS: the same mux answers over TLS
      val client = HttpClient.newBuilder().sslContext(insecureClientCtx).build()
      val r = client.send(HttpRequest.newBuilder(
          URI.create(s"https://127.0.0.1:${h.httpsPort}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, r.body())
      val tx = client.send(HttpRequest.newBuilder(
          URI.create(s"https://127.0.0.1:${h.httpsPort}/db/neo4j/tx/commit"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"statements":[{"statement":"RETURN 42 AS x"}]}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(tx.statusCode() == 200 && tx.body().contains("42"), tx.body())

      // plain HTTP stays up beside it (AllowHTTP shape)
      val plain = HttpClient.newHttpClient().send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${h.httpPort}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(plain.statusCode() == 200)

      // Bolt over TLS: handshake + HELLO + RUN/PULL through an SSLSocket
      val sock = insecureClientCtx.getSocketFactory
        .createSocket("127.0.0.1", h.boltPort).asInstanceOf[SSLSocket]
      sock.startHandshake()
      val out = sock.getOutputStream
      val in = sock.getInputStream
      out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
        0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      out.flush()
      val v = new Array[Byte](4)
      var n = 0
      while (n < 4) { val r2 = in.read(v, n, 4 - n); assert(r2 > 0); n += r2 }
      assert(v.toSeq == Seq[Byte](0, 0, 4, 4))
      def struct(sig: Int, fields: Any*): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(0xB0 + fields.length); b.write(sig)
        fields.foreach(PackStream.write(b, _))
        b.toByteArray
      }
      out.write(PackStream.frame(struct(0x01, Map("user_agent" -> "tls-spec"))))
      out.write(PackStream.frame(struct(0x10, "RETURN 7 AS n",
        Map.empty[String, Any], Map.empty[String, Any])))
      out.write(PackStream.frame(struct(0x3F, Map("n" -> -1L))))
      out.flush()
      def readMsg(): Array[Byte] = {
        val buf = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done) {
          val h0 = in.read(); val h1 = in.read()
          require(h0 >= 0 && h1 >= 0)
          val size = (h0 << 8) | h1
          if (size == 0 && buf.size() > 0) done = true
          else if (size > 0) {
            val b = new Array[Byte](size)
            var off = 0
            while (off < size) {
              val r3 = in.read(b, off, size - off); require(r3 >= 0); off += r3
            }
            buf.write(b)
          }
        }
        buf.toByteArray
      }
      assert((readMsg()(1) & 0xFF) == 0x70) // HELLO SUCCESS
      assert((readMsg()(1) & 0xFF) == 0x70) // RUN SUCCESS
      val rec = readMsg()
      assert((rec(1) & 0xFF) == 0x71)
      assert(PackStream.decode(rec, 0)._1.asInstanceOf[Seq[Any]].head == 7L)
      sock.close()
    } finally h.stop()
  }
}
