package graft.server

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.security.{KeyFactory, KeyStore, PrivateKey}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS termination for the client-facing fronts (reference
  * x/tls_helper.go:44 server flags `server-cert`/`server-key`/`ca-cert`,
  * :112 internal-port config; exercised by the reference's tlstest/
  * suite). Config is reference-style PEM files:
  *
  *  - `certFile` — server certificate (chain), PEM
  *  - `keyFile`  — PKCS#8 private key (`BEGIN PRIVATE KEY`), PEM
  *  - `clientCaFile` — when set, client certificates are REQUIRED and
  *    verified against this CA (the reference's
  *    `client-auth-type=REQUIREANDVERIFY` mode)
  *
  * Both fronts build from the same config: the HTTP server takes the
  * JDK [[SSLContext]]; the gRPC front wraps the same key material in a
  * Netty `SslContext` with ALPN h2 (gRPC requires HTTP/2 over TLS).
  * Only public JDK/Netty APIs — no extra jars.
  */
object Tls {

  final case class Config(certFile: String, keyFile: String,
      clientCaFile: Option[String] = None) {
    def needClientAuth: Boolean = clientCaFile.isDefined
  }

  // ---- PEM parsing (public APIs only) ----

  private def pemBlocks(path: String, header: String): Seq[Array[Byte]] = {
    val txt = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val re = ("(?s)-----BEGIN " + header + "-----(.*?)-----END " +
      header + "-----").r
    re.findAllMatchIn(txt).map { m =>
      java.util.Base64.getMimeDecoder.decode(m.group(1).trim)
    }.toSeq
  }

  /** All certificates in a PEM file, in order. */
  def certificates(path: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    val blocks = pemBlocks(path, "CERTIFICATE")
    require(blocks.nonEmpty, s"no CERTIFICATE blocks in $path")
    blocks.map(b => cf.generateCertificate(new ByteArrayInputStream(b))
      .asInstanceOf[X509Certificate])
  }

  /** PKCS#8 private key from PEM (`BEGIN PRIVATE KEY`). Tries RSA then
    * EC — the two key types the reference's helper generates.
    */
  def privateKey(path: String): PrivateKey = {
    val blocks = pemBlocks(path, "PRIVATE KEY")
    require(blocks.nonEmpty,
      s"no PRIVATE KEY block in $path (PKCS#8 required; " +
        "convert PKCS#1 with `openssl pkcs8 -topk8 -nocrypt`)")
    val spec = new PKCS8EncodedKeySpec(blocks.head)
    try KeyFactory.getInstance("RSA").generatePrivate(spec)
    catch {
      case _: java.security.spec.InvalidKeySpecException =>
        KeyFactory.getInstance("EC").generatePrivate(spec)
    }
  }

  // ---- JDK SSLContext (HTTP front) ----

  def sslContext(cfg: Config): SSLContext = {
    val chain = certificates(cfg.certFile)
    val key = privateKey(cfg.keyFile)
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    val pw = "graft-tls".toCharArray // in-memory store only, never written
    ks.setKeyEntry("server", key, pw, chain.toArray[java.security.cert.Certificate])
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw)
    val tms = cfg.clientCaFile.map { ca =>
      val ts = KeyStore.getInstance("PKCS12")
      ts.load(null, null)
      certificates(ca).zipWithIndex.foreach { case (c, i) =>
        ts.setCertificateEntry(s"ca$i", c)
      }
      val tmf = TrustManagerFactory
        .getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ts)
      tmf.getTrustManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    ctx
  }

  // ---- Netty SslContext (gRPC front: TLS + ALPN h2) ----

  def nettyServerContext(cfg: Config): io.netty.handler.ssl.SslContext = {
    import io.netty.handler.ssl._
    val b = SslContextBuilder
      .forServer(new java.io.File(cfg.certFile), new java.io.File(cfg.keyFile))
      .sslProvider(SslProvider.JDK)
      .applicationProtocolConfig(new ApplicationProtocolConfig(
        ApplicationProtocolConfig.Protocol.ALPN,
        ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
        ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
        ApplicationProtocolNames.HTTP_2))
    cfg.clientCaFile.foreach { ca =>
      b.trustManager(new java.io.File(ca))
        .clientAuth(ClientAuth.REQUIRE)
    }
    b.build()
  }
}
