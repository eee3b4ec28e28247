package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.KeyStore
import java.util.concurrent.CompletableFuture

import javax.net.ssl.{HttpsURLConnection, KeyManagerFactory, SSLContext, TrustManagerFactory}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaRegistry
import graft.server.{GrpcEndpoint, HttpEndpoint, Tls}
import graft.server.GrpcApi._
import graft.sources.RdfSource

/** TLS termination on both client-facing fronts (reference
  * x/tls_helper.go server flags; tlstest/ suite): handshake + a real
  * query over HTTPS and over gRPC-on-TLS, plus REQUIREANDVERIFY
  * client-cert enforcement. Fixtures are committed PEM files
  * (test-only CA) under src/test/resources/tls.
  */
class TlsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def res(name: String): String =
    getClass.getResource(s"/tls/$name").getPath

  private def endpoint(tls: Tls.Config): HttpEndpoint = {
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter("tname: string @index(exact) .")
    new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq("""<0x1> <tname> "secure-ann" .""").toDF("line")),
      tls = Some(tls))
  }

  /** Client SSLContext trusting the test CA; with a key/cert pair when
    * the server demands client auth. Built from the same PEM helpers
    * the server uses.
    */
  private def clientCtx(withClientCert: Boolean): SSLContext = {
    val ts = KeyStore.getInstance("PKCS12"); ts.load(null, null)
    Tls.certificates(res("ca.crt")).zipWithIndex.foreach { case (c, i) =>
      ts.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    val kms = if (withClientCert) {
      val ks = KeyStore.getInstance("PKCS12"); ks.load(null, null)
      ks.setKeyEntry("client", Tls.privateKey(res("client.key")),
        "pw".toCharArray,
        Tls.certificates(res("client.crt"))
          .toArray[java.security.cert.Certificate])
      val kmf = KeyManagerFactory.getInstance(
        KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, "pw".toCharArray)
      kmf.getKeyManagers
    } else null
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tmf.getTrustManagers, null)
    ctx
  }

  private def post(ctx: SSLContext, port: Int, path: String,
      body: String, contentType: String = "application/dql"): String = {
    val c = new java.net.URL(s"https://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpsURLConnection]
    c.setSSLSocketFactory(ctx.getSocketFactory)
    c.setHostnameVerifier((_, _) => true) // CN=localhost, we dial the IP
    c.setRequestMethod("POST"); c.setDoOutput(true)
    c.setRequestProperty("Content-Type", contentType)
    c.getOutputStream.write(body.getBytes(UTF_8))
    new String(c.getInputStream.readAllBytes(), UTF_8)
  }

  test("HTTPS front: handshake against the CA and a DQL query over it") {
    val ep = endpoint(Tls.Config(res("server.crt"), res("server.key")))
    val port = ep.start()
    try {
      val r = post(clientCtx(withClientCert = false), port, "/query",
        "{ q(func: has(tname)) { tname } }")
      assert(r.contains("secure-ann"), r)
      // plaintext client against the TLS port fails the protocol, never
      // silently serves
      val plain = new java.net.URL(s"http://127.0.0.1:$port/health")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      plain.setConnectTimeout(2000); plain.setReadTimeout(2000)
      intercept[java.io.IOException] {
        plain.getResponseCode; ()
      }
    } finally ep.stop()
  }

  test("HTTPS REQUIREANDVERIFY: client cert demanded and verified") {
    val ep = endpoint(Tls.Config(res("server.crt"), res("server.key"),
      clientCaFile = Some(res("ca.crt"))))
    val port = ep.start()
    try {
      // no client cert → handshake rejected
      intercept[java.io.IOException] {
        post(clientCtx(withClientCert = false), port, "/query",
          "{ q(func: has(tname)) { tname } }")
        ()
      }
      // CA-signed client cert → served
      val r = post(clientCtx(withClientCert = true), port, "/query",
        "{ q(func: has(tname)) { tname } }")
      assert(r.contains("secure-ann"), r)
    } finally ep.stop()
  }

  test("gRPC front over TLS: ALPN h2 handshake and a Query call") {
    import io.netty.bootstrap.Bootstrap
    import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
    import io.netty.channel.nio.NioIoHandler
    import io.netty.channel.socket.SocketChannel
    import io.netty.channel.socket.nio.NioSocketChannel
    import io.netty.handler.codec.http2._
    import io.netty.handler.ssl._

    val ep = endpoint(Tls.Config(res("server.crt"), res("server.key")))
    ep.start()
    val grpc = new GrpcEndpoint(ep,
      tls = Some(Tls.Config(res("server.crt"), res("server.key"))))
    val port = grpc.start()
    val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
    try {
      val sslCtx = SslContextBuilder.forClient()
        .sslProvider(SslProvider.JDK)
        .trustManager(new java.io.File(res("ca.crt")))
        .applicationProtocolConfig(new ApplicationProtocolConfig(
          ApplicationProtocolConfig.Protocol.ALPN,
          ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
          ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
          ApplicationProtocolNames.HTTP_2))
        .build()
      val b = new Bootstrap()
      b.group(group).channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[SocketChannel] {
          override def initChannel(c: SocketChannel): Unit = {
            c.pipeline().addLast(sslCtx.newHandler(c.alloc(), "localhost", port))
            c.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
            c.pipeline().addLast(
              new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
          }
        })
      val ch = b.connect("127.0.0.1", port).sync().channel()
      val done = new CompletableFuture[(Int, Array[Byte])]()
      val body = new java.io.ByteArrayOutputStream()
      val sb = new Http2StreamChannelBootstrap(ch)
      sb.handler(new ChannelInboundHandlerAdapter {
        private var status = -1
        override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit =
          m match {
            case h: Http2HeadersFrame =>
              Option(h.headers().get("grpc-status"))
                .foreach(s => status = s.toString.toInt)
              if (h.isEndStream) finish()
            case d: Http2DataFrame =>
              val buf = d.content()
              val bytes = new Array[Byte](buf.readableBytes())
              buf.readBytes(bytes)
              body.write(bytes)
              if (d.isEndStream) finish()
              d.release()
            case other => io.netty.util.ReferenceCountUtil.release(other)
          }
        private def finish(): Unit = {
          val bs = body.toByteArray
          val payload = if (bs.length >= 5)
            java.util.Arrays.copyOfRange(bs, 5, bs.length)
          else Array.emptyByteArray
          done.complete((status, payload)); ()
        }
      })
      val stream = sb.open().sync().getNow
      val headers = new DefaultHttp2Headers()
      headers.method("POST").path("/api.Dgraph/Query").scheme("https")
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      stream.write(new DefaultHttp2HeadersFrame(headers, false))
      val msg = encodeRequest(PRequest(
        query = "{ q(func: has(tname)) { tname } }")).result
      val framed = new Array[Byte](5 + msg.length)
      framed(1) = (msg.length >>> 24).toByte
      framed(2) = (msg.length >>> 16).toByte
      framed(3) = (msg.length >>> 8).toByte
      framed(4) = msg.length.toByte
      System.arraycopy(msg, 0, framed, 5, msg.length)
      stream.writeAndFlush(new DefaultHttp2DataFrame(
        io.netty.buffer.Unpooled.wrappedBuffer(framed), true))
      val (status, payload) =
        done.get(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(status == 0, s"grpc-status $status")
      assert(new String(decodeResponse(payload).json, UTF_8)
        .contains("secure-ann"))
      ch.close().sync()
    } finally {
      group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
      grpc.stop(); ep.stop()
    }
  }
}
