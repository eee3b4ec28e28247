package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Acl, SchemaRegistry}
import graft.server.{GrpcApi, GrpcEndpoint, HttpEndpoint}
import graft.server.GrpcApi._
import graft.sources.RdfSource

/** The gRPC front door (api.Dgraph service over HTTP/2) exercised
  * end-to-end with a real Netty h2c client speaking the same hand-rolled
  * proto wire format: CheckVersion, Query (+vars), Mutation commit-now
  * and queued-txn CommitOrAbort, Alter, Login/ACL, error statuses, and
  * cross-front visibility with the HTTP endpoint (one shared engine).
  */
class GrpcEndpointSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  // ---- minimal gRPC-over-HTTP/2 client ----

  private final class GrpcClient(port: Int) {
    private val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
    private val ch: Channel = {
      val b = new Bootstrap()
      b.group(group).channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[SocketChannel] {
          override def initChannel(c: SocketChannel): Unit = {
            c.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
            c.pipeline().addLast(
              new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
          }
        })
      b.connect("127.0.0.1", port).sync().channel()
    }

    /** One unary call: returns (grpc-status, grpc-message, response proto).
      * `compress = true` gzips the message and sets the compressed flag +
      * grpc-encoding header like grpc-go's UseCompressor("gzip"). */
    def call(path: String, msg: Array[Byte],
        token: Option[String] = None, compress: Boolean = false,
        encoding: String = "gzip",
        sendEncodingHeader: Boolean = true): (Int, String, Array[Byte]) = {
      val done = new CompletableFuture[(Int, String, Array[Byte])]()
      val body = new java.io.ByteArrayOutputStream()
      val sb = new Http2StreamChannelBootstrap(ch)
      sb.handler(new ChannelInboundHandlerAdapter {
        private var status = -1
        private var message = ""
        override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
          case h: Http2HeadersFrame =>
            Option(h.headers().get("grpc-status"))
              .foreach(s => status = s.toString.toInt)
            Option(h.headers().get("grpc-message")).foreach(s =>
              message = java.net.URLDecoder.decode(s.toString, "UTF-8"))
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
          val b = body.toByteArray
          // strip the 5-byte gRPC message frame when data arrived
          val payload = if (b.length >= 5)
            java.util.Arrays.copyOfRange(b, 5, b.length) else Array.emptyByteArray
          done.complete((status, message, payload))
        }
      })
      val stream = sb.open().sync().getNow
      val headers = new DefaultHttp2Headers()
      headers.method("POST").path(path).scheme("http")
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      token.foreach(t => headers.set("accessjwt", t))
      if (compress && sendEncodingHeader)
        headers.set("grpc-encoding", encoding)
      stream.write(new DefaultHttp2HeadersFrame(headers, false))
      val wire = if (compress) {
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(msg); gz.close()
        bo.toByteArray
      } else msg
      val framed = new Array[Byte](5 + wire.length)
      framed(0) = if (compress) 1 else 0
      framed(1) = (wire.length >>> 24).toByte
      framed(2) = (wire.length >>> 16).toByte
      framed(3) = (wire.length >>> 8).toByte
      framed(4) = wire.length.toByte
      System.arraycopy(wire, 0, framed, 5, wire.length)
      stream.writeAndFlush(
        new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(framed), true))
      done.get(20, TimeUnit.SECONDS)
    }

    def close(): Unit = {
      ch.close().sync()
      group.shutdownGracefully(0, 1, TimeUnit.SECONDS).sync()
    }
  }

  private def mkEndpoint(withAcl: Boolean = false): (HttpEndpoint, Option[Acl]) = {
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |age: int .""".stripMargin)
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq(
      """<0x1> <name> "alice" .""",
      """<0x2> <name> "bob" .""").toDF("line"))
    val acl = if (withAcl) Some(new Acl(
      users = Map(
        "groot" -> Acl.User("groot", Acl.hashPassword("groot", "password"),
          groups = Set("guardians")),
        "reader" -> Acl.User("reader", Acl.hashPassword("reader", "pw"),
          groups = Set("readers"))),
      groups = Map("readers" -> Seq(Acl.Rule("name", Acl.Read))),
      secret = "grpc-secret-0123456789abcdef!!!!")) else None
    (new HttpEndpoint(spark, reg, triples, acl = acl), acl)
  }

  test("CheckVersion, Query, vars, and unknown-method status") {
    val (ep, _) = mkEndpoint()
    val grpc = new GrpcEndpoint(ep, versionTag = "graft-test")
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      val (s0, _, v) = cli.call("/api.Dgraph/CheckVersion", Array.emptyByteArray)
      assert(s0 == 0)
      assert(GrpcApi.decodeVersion(v) == "graft-test")

      val q = encodeRequest(PRequest(
        query = "{ q(func: eq(name, \"alice\")) { name } }")).result
      val (s1, _, r1) = cli.call("/api.Dgraph/Query", q)
      assert(s1 == 0)
      val resp = decodeResponse(r1)
      assert(new String(resp.json, UTF_8) ==
        """{"q":[{"uid":"0x1","name":"alice"}]}""")

      // $-vars through Request.vars
      val qv = encodeRequest(PRequest(
        query = "query q($n: string) { q(func: eq(name, $n)) { name } }",
        vars = Map("$n" -> "bob"))).result
      val (s2, _, r2) = cli.call("/api.Dgraph/Query", qv)
      assert(s2 == 0)
      assert(new String(decodeResponse(r2).json, UTF_8).contains("bob"))

      val (s3, m3, _) = cli.call("/api.Dgraph/Nope", Array.emptyByteArray)
      assert(s3 == 12 && m3.contains("unknown method"))

      // an errored call must not break the connection for the next one
      val (s4, _, _) = cli.call("/api.Dgraph/Query", q)
      assert(s4 == 0)
    } finally { cli.close(); grpc.stop() }
  }

  test("mutations: commit-now, queued txn with CommitOrAbort, abort, JSON form, cross-front visibility") {
    val (ep, _) = mkEndpoint()
    val grpc = new GrpcEndpoint(ep)
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      def queryNames(): String = {
        val q = encodeRequest(PRequest(
          query = "{ q(func: has(name)) { name } }")).result
        val (s, _, r) = cli.call("/api.Dgraph/Query", q)
        assert(s == 0)
        new String(decodeResponse(r).json, UTF_8)
      }
      // commit-now set_nquads
      val m1 = encodeRequest(PRequest(
        mutations = Seq(PMutation(
          setNquads = """<0x3> <name> "carol" .""".getBytes(UTF_8))),
        commitNow = true)).result
      val (s1, _, _) = cli.call("/api.Dgraph/Query", m1)
      assert(s1 == 0)
      assert(queryNames().contains("carol"))

      // queued txn: invisible until CommitOrAbort commits
      val m2 = encodeRequest(PRequest(
        mutations = Seq(PMutation(
          setNquads = """<0x4> <name> "dave" .""".getBytes(UTF_8))))).result
      val (s2, _, r2) = cli.call("/api.Dgraph/Query", m2)
      assert(s2 == 0)
      val ts = decodeResponse(r2).txn.get.startTs
      assert(ts > 0)
      assert(!queryNames().contains("dave"))
      val (s3, _, r3) = cli.call("/api.Dgraph/CommitOrAbort",
        encodeTxnContext(PTxnContext(startTs = ts)).result)
      assert(s3 == 0)
      assert(decodeTxnContext(r3).commitTs == ts + 1)
      assert(queryNames().contains("dave"))

      // abort: queued then discarded
      val m3 = encodeRequest(PRequest(
        mutations = Seq(PMutation(
          setNquads = """<0x5> <name> "eve" .""".getBytes(UTF_8))))).result
      val (_, _, r4) = cli.call("/api.Dgraph/Query", m3)
      val ts2 = decodeResponse(r4).txn.get.startTs
      val (s5, _, r5) = cli.call("/api.Dgraph/CommitOrAbort",
        encodeTxnContext(PTxnContext(startTs = ts2, aborted = true)).result)
      assert(s5 == 0 && decodeTxnContext(r5).aborted)
      assert(!queryNames().contains("eve"))

      // JSON mutation form (Mutation.set_json carries the array directly)
      val mj = encodeRequest(PRequest(
        mutations = Seq(PMutation(
          setJson = """[{"uid":"0x6","name":"frank"}]""".getBytes(UTF_8))),
        commitNow = true)).result
      val (s6, _, _) = cli.call("/api.Dgraph/Query", mj)
      assert(s6 == 0)
      assert(queryNames().contains("frank"))

      // cross-front: the gRPC-committed rows are visible over HTTP
      val hport = ep.start()
      try {
        val c = new java.net.URL(s"http://127.0.0.1:$hport/query")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST"); c.setDoOutput(true)
        c.getOutputStream.write("{ q(func: has(name)) { name } }".getBytes(UTF_8))
        val httpResp = new String(c.getInputStream.readAllBytes(), UTF_8)
        assert(httpResp.contains("carol") && httpResp.contains("frank"))
      } finally ep.stop()

      // upsert: Request{query, mutations} routes through the Upsert
      // operator — conditional on len(v), uid(v) substitution
      val up = encodeRequest(PRequest(
        query = """{ v as q(func: eq(name, "carol")) }""",
        mutations = Seq(PMutation(
          cond = "@if(gt(len(v), 0))",
          setNquads = """uid(v) <name> "carol-2" .""".getBytes(UTF_8))),
        commitNow = true)).result
      val (s7, m7, _) = cli.call("/api.Dgraph/Query", up)
      assert(s7 == 0, m7)
      assert(queryNames().contains("carol-2"))
      // a false @if leaves the store untouched
      val upNoop = encodeRequest(PRequest(
        query = """{ v as q(func: eq(name, "no-such-name")) }""",
        mutations = Seq(PMutation(
          cond = "@if(gt(len(v), 0))",
          setNquads = """uid(v) <name> "never" .""".getBytes(UTF_8))),
        commitNow = true)).result
      val (s8, _, _) = cli.call("/api.Dgraph/Query", upNoop)
      assert(s8 == 0)
      assert(!queryNames().contains("never"))
      // upserts without commit_now answer UNIMPLEMENTED, not silence
      val upQueued = encodeRequest(PRequest(
        query = """{ v as q(func: has(name)) }""",
        mutations = Seq(PMutation(
          setNquads = """uid(v) <age> "1" .""".getBytes(UTF_8))))).result
      val (s9, m9, _) = cli.call("/api.Dgraph/Query", upQueued)
      assert(s9 == 12 && m9.contains("commit_now"))
    } finally { cli.close(); grpc.stop() }
  }

  test("gzip-compressed frames and JSON-form upsert templates") {
    val (ep, _) = mkEndpoint()
    val grpc = new GrpcEndpoint(ep)
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      // gzip request frame (dgo with grpc.UseCompressor("gzip")):
      // compressed flag = 1, grpc-encoding: gzip header
      val q = encodeRequest(PRequest(
        query = "{ q(func: has(name)) { name } }")).result
      val (s, msg, r) = cli.call("/api.Dgraph/Query", q,
        compress = true)
      assert(s == 0, s"$s $msg")
      assert(new String(decodeResponse(r).json, UTF_8).contains("alice"))
      // an unknown codec still answers UNIMPLEMENTED
      val (s2, msg2, _) = cli.call("/api.Dgraph/Query", q,
        compress = true, encoding = "snappy")
      assert(s2 == 12 && msg2.contains("snappy"), s"$s2 $msg2")

      // JSON-form upsert: SetJson with uid(v) templates + @if cond
      val up = encodeRequest(PRequest(
        query = """{ v as q(func: eq(name, "alice")) }""",
        mutations = Seq(PMutation(
          cond = "@if(gt(len(v), 0))",
          setJson = """[{"uid":"uid(v)","name":"alice-upserted"}]"""
            .getBytes(UTF_8))),
        commitNow = true)).result
      val (s3, m3, _) = cli.call("/api.Dgraph/Query", up)
      assert(s3 == 0, s"$s3 $m3")
      val (s4, _, r4) = cli.call("/api.Dgraph/Query",
        encodeRequest(PRequest(
          query = "{ q(func: has(name)) { name } }")).result)
      assert(s4 == 0)
      assert(new String(decodeResponse(r4).json, UTF_8)
        .contains("alice-upserted"))
      // val(var) JSON value substitution is out of the template grammar:
      // loud UNIMPLEMENTED, not a silent literal write
      val bad = encodeRequest(PRequest(
        query = """{ v as q(func: has(name)) }""",
        mutations = Seq(PMutation(
          setJson = """[{"uid":"uid(v)","name":"val(x)"}]""".getBytes(UTF_8))),
        commitNow = true)).result
      val (s5, m5, _) = cli.call("/api.Dgraph/Query", bad)
      assert(s5 == 12 && m5.contains("val(var)"), s"$s5 $m5")

      // a JSON null in a SET is skipped (nil struct field serialized as
      // explicit null), never written as the literal string "null"
      val nullSet = encodeRequest(PRequest(
        query = """{ v as q(func: eq(name, "bob")) }""",
        mutations = Seq(PMutation(
          setJson = """[{"uid":"uid(v)","name":null,"age":"7"}]"""
            .getBytes(UTF_8))),
        commitNow = true)).result
      val (s6, m6, _) = cli.call("/api.Dgraph/Query", nullSet)
      assert(s6 == 0, s"$s6 $m6")
      val (s7, _, r7) = cli.call("/api.Dgraph/Query", encodeRequest(PRequest(
        query = """{ q(func: eq(name, "bob")) { name age } }""")).result)
      assert(s7 == 0)
      val bob = new String(decodeResponse(r7).json, UTF_8)
      assert(bob.contains("\"bob\"") && bob.contains("\"age\":7"), bob)
      assert(!bob.contains("null"), bob)

      // gzip bomb guard: a small frame inflating past the 64 MB cap is
      // rejected with the size error, not an OOM
      val zeros = new Array[Byte](70 * 1024 * 1024)
      val (s8, m8, _) = cli.call("/api.Dgraph/Query", zeros, compress = true)
      assert(s8 != 0 && m8.contains("larger than max"), s"$s8 $m8")

      // compressed flag set with NO grpc-encoding header is a protocol
      // error per the gRPC spec → INTERNAL(13) with a clear message
      // (grpc-go's behavior), not a confusing protobuf-decode UNKNOWN
      val (s9, m9, _) = cli.call("/api.Dgraph/Query", q,
        compress = true, sendEncodingHeader = false)
      assert(s9 == 13 && m9.contains("compressed flag"), s"$s9 $m9")
    } finally { cli.close(); grpc.stop() }
  }

  test("unknown/foreign txn answers ABORTED (10) so dgo retry loops retry") {
    val (ep, _) = mkEndpoint()
    val grpc = new GrpcEndpoint(ep)
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      // commit of a never-issued ts: ABORTED with the reference message
      val (s, msg, _) = cli.call("/api.Dgraph/CommitOrAbort",
        encodeTxnContext(PTxnContext(startTs = 999999L)).result)
      assert(s == 10, s"expected ABORTED(10), got $s: $msg")
      assert(msg.contains("Transaction has been aborted. Please retry"), msg)
      // double-commit: the second attempt is ABORTED, not UNKNOWN
      val m = encodeRequest(PRequest(
        mutations = Seq(PMutation(
          setNquads = """<0x41> <name> "gina" .""".getBytes(UTF_8))))).result
      val (_, _, r) = cli.call("/api.Dgraph/Query", m)
      val ts = decodeResponse(r).txn.get.startTs
      val (c1, _, _) = cli.call("/api.Dgraph/CommitOrAbort",
        encodeTxnContext(PTxnContext(startTs = ts)).result)
      assert(c1 == 0)
      val (c2, msg2, _) = cli.call("/api.Dgraph/CommitOrAbort",
        encodeTxnContext(PTxnContext(startTs = ts)).result)
      assert(c2 == 10, s"expected ABORTED(10), got $c2: $msg2")
    } finally { cli.close(); grpc.stop() }
  }

  test("long-lived channel survives >64 KiB cumulative request data (flow control)") {
    val (ep, _) = mkEndpoint()
    val grpc = new GrpcEndpoint(ep)
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      // one idempotent set line repeated to ~40 KiB per request; four
      // requests push ~160 KiB through ONE connection — far past the
      // 64 KiB initial connection window. Without the server returning
      // consumed bytes via WINDOW_UPDATE, the client's flow controller
      // queues the later frames forever and call() times out (this is
      // dgo's deployment shape: one channel for the process lifetime).
      val line = """<0x42> <name> "henry" ."""
      val big = Array.fill(1800)(line).mkString("\n")
      val req = encodeRequest(PRequest(
        mutations = Seq(PMutation(setNquads = big.getBytes(UTF_8))),
        commitNow = true)).result
      assert(req.length > 40000, s"payload only ${req.length}B")
      (1 to 4).foreach { i =>
        val (s, msg, _) = cli.call("/api.Dgraph/Query", req)
        assert(s == 0, s"call $i failed: $s $msg")
      }
    } finally { cli.close(); grpc.stop() }
  }

  test("Alter (schema + drop_attr) and Login/ACL enforcement over gRPC") {
    val (ep, aclOpt) = mkEndpoint(withAcl = true)
    val grpc = new GrpcEndpoint(ep)
    val port = grpc.start()
    val cli = new GrpcClient(port)
    try {
      // no token: query + alter both refuse
      val q = encodeRequest(PRequest(
        query = "{ q(func: has(name)) { name } }")).result
      val (sNo, mNo, _) = cli.call("/api.Dgraph/Query", q)
      assert(sNo == 7 && mNo.contains("accessJwt"))

      // Login → proto Jwt in Response.json
      val (sL, _, rL) = cli.call("/api.Dgraph/Login",
        encodeLoginRequest(PLoginRequest(
          userid = "groot", password = "password")).result)
      assert(sL == 0)
      val (jwt, refresh) = decodeJwt(decodeResponse(rL).json)
      assert(jwt.nonEmpty && refresh.nonEmpty)

      val (sQ, _, rQ) = cli.call("/api.Dgraph/Query", q, Some(jwt))
      assert(sQ == 0)
      assert(new String(decodeResponse(rQ).json, UTF_8).contains("alice"))

      // refresh-token login path
      val (sR, _, rR) = cli.call("/api.Dgraph/Login",
        encodeLoginRequest(PLoginRequest(refreshToken = refresh)).result)
      assert(sR == 0)

      // namespace rides api.LoginRequest field 4 (tenant login): a user
      // registered in ns 7 logs in only WITH the namespace, and the
      // issued JWT carries the tenant's namespace claim
      aclOpt.get.addUser(core.Acl.User("t-groot",
        core.Acl.hashPassword("t-groot", "tpw"),
        Set(core.Acl.Guardians), namespace = 7L))
      val (sT, _, rT) = cli.call("/api.Dgraph/Login",
        encodeLoginRequest(PLoginRequest(
          userid = "t-groot", password = "tpw", namespace = 7L)).result)
      assert(sT == 0)
      val (tJwt, _) = decodeJwt(decodeResponse(rT).json)
      assert(aclOpt.get.claims(tJwt).get("namespace").contains("7"))
      val (sT0, _, _) = cli.call("/api.Dgraph/Login",
        encodeLoginRequest(PLoginRequest(
          userid = "t-groot", password = "tpw")).result)
      assert(sT0 != 0, "default-namespace login for a tenant user fails")

      // reader token: unauthorized predicate resolves empty (silent)
      val (sRd, _, rRd) = cli.call("/api.Dgraph/Login",
        encodeLoginRequest(PLoginRequest(
          userid = "reader", password = "pw")).result)
      assert(sRd == 0)
      val (readerJwt, _) = decodeJwt(decodeResponse(rRd).json)
      val qa = encodeRequest(PRequest(
        query = "{ q(func: has(name)) { name age } }")).result
      val (sA, _, rA) = cli.call("/api.Dgraph/Query", qa, Some(readerJwt))
      assert(sA == 0)
      val body = new String(decodeResponse(rA).json, UTF_8)
      assert(body.contains("alice") && !body.contains("age"))

      // alter is guardian-gated: reader refused, groot allowed
      val alterOp = encodeOperation(POperation(
        schema = "city: string @index(term) .")).result
      val (sAl1, mAl1, _) = cli.call("/api.Dgraph/Alter", alterOp, Some(readerJwt))
      assert(sAl1 == 7 && mAl1.contains("guardians"))
      val (sAl2, _, pay) = cli.call("/api.Dgraph/Alter", alterOp, Some(jwt))
      assert(sAl2 == 0)
      assert(new String(GrpcApi.decodePayload(pay), UTF_8) == "Success")

      // drop_attr through Operation
      val (sAl3, _, _) = cli.call("/api.Dgraph/Alter",
        encodeOperation(POperation(dropAttr = "age")).result, Some(jwt))
      assert(sAl3 == 0)
    } finally { cli.close(); grpc.stop() }
  }
}
