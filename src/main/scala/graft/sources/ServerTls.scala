package graft.sources

import java.io.{ByteArrayInputStream, File}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.KeyStore
import java.security.cert.{Certificate, CertificateFactory}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** TLS material loading for the Bolt and HTTPS listeners — the engine's
  * analog of the reference's TLS config surface
  * (`/root/reference/pkg/config/config.go:218-243`,
  * `nornicdb.example.yaml` `server.tls` / `server.https`): a PEM
  * certificate chain (`cert_file`, any number of CERTIFICATE blocks) and
  * a PKCS#8 PEM private key (`key_file`, `BEGIN PRIVATE KEY`), or a
  * `base_directory` holding `public.crt` + `private.key` (the
  * NORNICDB_TLS_DIR contract, config.go:830-832).
  *
  * Pure JDK: CertificateFactory reads PEM certificates natively; the key
  * is Base64-decoded PKCS#8 tried against the platform key factories
  * (RSA, EC, Ed25519). The pair loads into an in-memory keystore behind
  * one SSLContext that both listeners share.
  */
object ServerTls {

  private val keyAlgos = Seq("RSA", "EC", "EdDSA", "DSA")

  def loadPrivateKey(pem: String): java.security.PrivateKey = {
    val body = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = Base64.getMimeDecoder.decode(body)
    val spec = new PKCS8EncodedKeySpec(der)
    keyAlgos.view.flatMap { algo =>
      try Some(java.security.KeyFactory.getInstance(algo).generatePrivate(spec))
      catch { case _: Exception => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"private key is not PKCS#8 ${keyAlgos.mkString("/")}"))
  }

  def loadCertificates(pem: String): Seq[Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    import scala.jdk.CollectionConverters._
    cf.generateCertificates(new ByteArrayInputStream(
      pem.getBytes(StandardCharsets.UTF_8))).asScala.toSeq
  }

  /** Build the server SSLContext from PEM files. */
  def sslContext(certFile: String, keyFile: String): SSLContext = {
    def read(p: String): String =
      new String(Files.readAllBytes(new File(p).toPath), StandardCharsets.UTF_8)
    val certs = loadCertificates(read(certFile))
    require(certs.nonEmpty, s"no CERTIFICATE blocks in $certFile")
    val key = loadPrivateKey(read(keyFile))

    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    val pw = Array.emptyCharArray
    ks.setKeyEntry("server", key, pw, certs.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Resolve the configured material: explicit cert/key paths win; a
    * base directory implies `public.crt` + `private.key` inside it
    * (config.go:830-832). None = TLS not configured.
    */
  def fromConfig(certFile: String, keyFile: String,
      baseDirectory: String): Option[SSLContext] = {
    val (c, k) =
      if (certFile.nonEmpty && keyFile.nonEmpty) (certFile, keyFile)
      else if (baseDirectory.nonEmpty)
        (s"$baseDirectory/public.crt", s"$baseDirectory/private.key")
      else return None
    if (!new File(c).isFile || !new File(k).isFile) None
    else Some(sslContext(c, k))
  }
}
