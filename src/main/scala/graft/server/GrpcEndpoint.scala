package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelDuplexHandler, ChannelHandlerContext, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2FrameStream, Http2HeadersFrame}
import io.netty.util.ReferenceCountUtil

import graft.core.Acl
import GrpcApi._

/** The gRPC half of the reference's front door (`api.Dgraph` service —
  * Login / Query / Alter / CommitOrAbort / CheckVersion, reference
  * edgraph/server.go:1346; route prefix `/api.Dgraph/`), served WITHOUT
  * grpc-java or a protobuf toolchain: Netty's HTTP/2 frame codec (which
  * ships with Spark) carries the transport, [[Proto]]/[[GrpcApi]] carry
  * the message wire format, and the gRPC layer between them is only a
  * 5-byte message frame (compressed flag + u32 length), three response
  * headers, and `grpc-status` trailers.
  *
  * Serving model mirrors the reference's alpha: ONE engine serves both
  * fronts — this endpoint wraps the [[HttpEndpoint]]'s transport-
  * independent core (queryData / mutateParsed / commitTxn / alterBody),
  * so a mutation committed over gRPC is immediately visible over HTTP
  * and vice versa, including the shared open-transaction table
  * (commit_now=false queues; CommitOrAbort drains or discards).
  *
  * Auth rides the `accessjwt` request metadata key exactly like the
  * reference clients send it (dgo attaches md "accessJwt"; gRPC
  * lowercases metadata keys on the wire).
  *
  * Request{query, mutations} — the reference's upsert form — routes
  * through the engine's Upsert operator (uid(v)/val(v) substitution,
  * @if conditions), commit-now.
  *
  * Scope notes (documented, spec-asserted): unary calls only (the
  * reference's client API is unary; its streaming RPCs are internal
  * cluster traffic the Spark engine replaces). gzip-compressed request
  * frames are accepted (grpc-encoding: gzip, what dgo/grpc-go
  * negotiate); other codecs answer UNIMPLEMENTED. Upsert templates take
  * both the N-Quads and the JSON form (SetJson/DeleteJson with uid(v)
  * subject/ref templates); val(var) JSON value substitution answers
  * UNIMPLEMENTED.
  */
final class GrpcEndpoint(core: HttpEndpoint,
    versionTag: String = "graft-spark",
    audit: Option[AuditLog] = None,
    tls: Option[Tls.Config] = None) {

  @volatile private var group: MultiThreadIoEventLoopGroup = _
  @volatile private var channel: Channel = _

  def start(port: Int = 0): Int = {
    group = new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
    val b = new ServerBootstrap()
    b.group(group).channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        // TLS + ALPN h2 when configured (reference tls_helper; grpc
        // clients negotiate http/2 via ALPN over TLS), h2c otherwise
        private val sslCtx = tls.map(Tls.nettyServerContext)
        override def initChannel(ch: SocketChannel): Unit = {
          sslCtx.foreach(c => ch.pipeline().addLast(c.newHandler(ch.alloc())))
          ch.pipeline().addLast(Http2FrameCodecBuilder.forServer().build())
          ch.pipeline().addLast(new GrpcHandler)
        }
      })
    channel = b.bind(new InetSocketAddress(port)).sync().channel()
    // the /admin shutdown mutation must stop the WHOLE server, not
    // just the HTTP front — register with the shared core
    core.onShutdown(() => stop())
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort
  }

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    if (group != null)
      group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS).sync()
  }

  // ---- HTTP/2 frame handling (h2c prior-knowledge, like grpc clients) ----

  private final class StreamState(val path: String, val token: Option[String],
      val encoding: Option[String]) {
    val body = new java.io.ByteArrayOutputStream(256)
  }

  private final class GrpcHandler extends ChannelDuplexHandler {
    private val streams =
      new java.util.IdentityHashMap[Http2FrameStream, StreamState]()

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          val path = Option(h.headers().path()).map(_.toString).getOrElse("")
          val tok = Option(h.headers().get("accessjwt")).map(_.toString)
          val enc = Option(h.headers().get("grpc-encoding")).map(_.toString)
          val st = new StreamState(path, tok, enc)
          streams.put(h.stream(), st)
          if (h.isEndStream) respond(ctx, h.stream(), st)
        case d: Http2DataFrame =>
          val st = streams.get(d.stream())
          if (st != null) {
            val buf = d.content()
            val bytes = new Array[Byte](buf.readableBytes())
            buf.readBytes(bytes)
            st.body.write(bytes)
          }
          // return the consumed flow-controlled bytes (data + padding):
          // Http2FrameCodec routes a WINDOW_UPDATE write through
          // consumeBytes, which replenishes BOTH the stream and the
          // connection windows. Without this a long-lived channel (dgo
          // keeps one) stalls permanently once ~64 KiB of cumulative
          // request bytes exhausts the initial windows.
          val consumed = d.initialFlowControlledBytes()
          val endStream = d.isEndStream
          val stream = d.stream()
          d.release()
          if (consumed > 0)
            ctx.writeAndFlush(
              new DefaultHttp2WindowUpdateFrame(consumed).stream(stream))
          if (st != null && endStream) respond(ctx, stream, st)
        case other => ReferenceCountUtil.release(other)
      }

    private def respond(ctx: ChannelHandlerContext, stream: Http2FrameStream,
        st: StreamState): Unit = {
      streams.remove(stream)
      val t0 = System.nanoTime()
      val (status, message, payload) =
        try {
          val req = deframe(st.body.toByteArray, st.encoding)
          (0, "", dispatch(st.path, req, st.token))
        } catch {
          case e: UnsupportedOperationException =>
            (12, String.valueOf(e.getMessage), null) // UNIMPLEMENTED
          case e: GrpcEndpoint.GrpcProtocolException =>
            (13, e.msg, null) // INTERNAL — malformed wire frame
          case e: Acl.AclException => (7, e.msg, null) // PERMISSION_DENIED
          case _: HttpEndpoint.TxnRetryException =>
            // ABORTED — dgo's retry loop retries this status and treats
            // everything else as fatal (reference y.ErrAborted message)
            (10, "Transaction has been aborted. Please retry", null)
          case e: Throwable => // UNKNOWN, reference surfaces the message
            (2, Option(e.getMessage).getOrElse(e.getClass.getSimpleName), null)
        }
      core.metrics.inc("graft_grpc_requests_total",
        "method" -> st.path, "status" -> status.toString)
      core.metrics.addNanos("graft_request_seconds_total",
        System.nanoTime() - t0, "path" -> st.path)
      if (status == 0) {
        val headers = new DefaultHttp2Headers()
        headers.status("200")
        headers.set("content-type", "application/grpc")
        ctx.write(new DefaultHttp2HeadersFrame(headers, false).stream(stream))
        ctx.write(new DefaultHttp2DataFrame(
          Unpooled.wrappedBuffer(frame(payload)), false).stream(stream))
        val trailers = new DefaultHttp2Headers()
        trailers.set("grpc-status", "0")
        ctx.write(new DefaultHttp2HeadersFrame(trailers, true).stream(stream))
      } else {
        // trailers-only error response (gRPC over HTTP/2 spec)
        val headers = new DefaultHttp2Headers()
        headers.status("200")
        headers.set("content-type", "application/grpc")
        headers.set("grpc-status", status.toString)
        headers.set("grpc-message",
          java.net.URLEncoder.encode(message, "UTF-8").replace("+", "%20"))
        ctx.write(new DefaultHttp2HeadersFrame(headers, true).stream(stream))
      }
      ctx.flush()
    }
  }

  // ---- gRPC message framing: 1-byte compressed flag + u32 BE length ----

  private def frame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(1) = (msg.length >>> 24).toByte
    out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte
    out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  // grpc-go's default max receive size is 4 MB; dgo raises it for bulk
  // clients, so allow a generous but bounded 64 MB
  private val MaxInflatedBytes: Int = 64 * 1024 * 1024

  private def deframe(b: Array[Byte],
      encoding: Option[String]): Array[Byte] = {
    if (b.length < 5)
      throw new IllegalArgumentException("truncated gRPC frame")
    val len = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    if (b.length < 5 + len)
      throw new IllegalArgumentException("truncated gRPC message")
    val msg = java.util.Arrays.copyOfRange(b, 5, 5 + len)
    if (b(0) == 0) msg
    else encoding match {
      // compressed flag set: the algorithm rides grpc-encoding. gzip is
      // what dgo/grpc-go negotiate (grpc.UseCompressor("gzip")); the
      // JDK inflater handles it without extra jars. identity with the
      // flag set is a spec violation — treat the bytes as-is.
      case Some("gzip") =>
        // bound the DECOMPRESSED size like grpc-go's
        // maxReceiveMessageSize — gzip ratios reach ~1000:1, so an
        // unbounded inflate lets a ~1 MB frame allocate gigabytes on
        // the driver JVM before any message-size check
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(msg))
        try {
          val out = new java.io.ByteArrayOutputStream(
            math.min(msg.length * 4, MaxInflatedBytes))
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) {
            if (out.size + n > MaxInflatedBytes)
              throw new IllegalArgumentException(
                s"grpc: received message larger than max " +
                  s"($MaxInflatedBytes bytes) after decompression")
            out.write(buf, 0, n)
            n = in.read(buf)
          }
          out.toByteArray
        } finally in.close()
      // per the gRPC spec (PROTOCOL-HTTP2: Compressed-Flag) a set flag
      // with identity or ABSENT grpc-encoding is a protocol error —
      // grpc-go answers INTERNAL with this exact shape; passing the
      // bytes through would instead fail protobuf decoding later and
      // surface as a confusing UNKNOWN
      case Some("identity") | None =>
        throw GrpcEndpoint.GrpcProtocolException(
          "grpc: compressed flag set with identity or unset grpc-encoding")
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"unsupported grpc-encoding: $other (supported: gzip, identity)")
    }
  }

  // ---- service dispatch ----

  private def dispatch(path: String, body: Array[Byte],
      tok: Option[String]): Array[Byte] = {
    // audit parity with the HTTP front (reference ee/audit AuditGrpc:
    // method + user per request; bodies are proto, log the method)
    audit.foreach { a =>
      val user = for {
        acl <- core.aclOpt
        t <- tok
        u <- (try acl.claims(t).get("userid")
        catch { case _: Throwable => None })
      } yield u
      a.log(path, user.getOrElse("anonymous"), s"<${body.length} proto bytes>")
    }
    dispatch0(path, body, tok)
  }

  private def dispatch0(path: String, body: Array[Byte],
      tok: Option[String]): Array[Byte] = path match {
    case "/api.Dgraph/CheckVersion" => encodeVersion(versionTag)
    case "/api.Dgraph/Login" => login(decodeLoginRequest(body))
    // draining mode refuses client work on BOTH fronts (reference
    // x.HealthCheck gates every alpha handler); Login/CheckVersion stay
    // served like the HTTP front keeps /login and /health
    case "/api.Dgraph/Query" =>
      core.requireServing()
      queryOrMutate(decodeRequest(body), tok)
    case "/api.Dgraph/Alter" =>
      core.requireServing()
      alter(decodeOperation(body), tok)
    case "/api.Dgraph/CommitOrAbort" =>
      core.requireServing()
      commitOrAbort(decodeTxnContext(body), tok)
    case other =>
      throw new UnsupportedOperationException(s"unknown method $other")
  }

  private def login(l: PLoginRequest): Array[Byte] = {
    val acl = core.aclOpt.getOrElse(throw Acl.AclException("ACL is not enabled"))
    // refresh-token logins re-issue from the still-valid token's user
    // (single-secret engine: the access JWT doubles as the refresh one)
    val jwt =
      if (l.refreshToken.nonEmpty)
        acl.claims(l.refreshToken).get("userid") match {
          case Some(_) => l.refreshToken
          case None => throw Acl.AclException("invalid refresh token")
        }
      else acl.login(l.userid, l.password, l.namespace)
    encodeResponse(PResponse(json = encodeJwt(jwt, jwt))).result
  }

  private def queryOrMutate(req: PRequest, tok: Option[String]): Array[Byte] = {
    if (req.mutations.isEmpty) {
      // $-prefix vars like the HTTP front (api.Request.Vars carries the
      // $-prefixed names from QueryWithVars; tolerate unprefixed)
      val vars = req.vars.map { case (k, v) =>
        (if (k.startsWith("$")) k else "$" + k) -> v
      }
      val json = core.queryData(req.query, vars, tok)
      encodeResponse(PResponse(
        json = json.getBytes(UTF_8),
        txn = Some(PTxnContext(startTs = req.startTs)))).result
    } else if (req.query.nonEmpty) {
      // Request{query, mutations} = the reference's upsert path
      // (doQuery → doMutate with uid(v)/val(v) substitution). N-Quads
      // templates only; upserts commit now (single-writer engine).
      if (!req.commitNow && !req.mutations.exists(_.commitNow))
        throw new UnsupportedOperationException(
          "upserts require commit_now over this front (single-writer)")
      def lines(b: Array[Byte]): Seq[String] =
        new String(b, UTF_8).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      // JSON-form templates (dgo SetJson/DeleteJson + query) convert to
      // the same N-Quad template lines the DQL upsert block takes
      val muts = req.mutations.map { m =>
        val sets = lines(m.setNquads) ++ (if (m.setJson.nonEmpty)
          core.jsonUpsertTemplates(new String(m.setJson, UTF_8),
            isDelete = false) else Nil)
        val dels = lines(m.delNquads) ++ (if (m.deleteJson.nonEmpty)
          core.jsonUpsertTemplates(new String(m.deleteJson, UTF_8),
            isDelete = true) else Nil)
        (m.cond, sets, dels)
      }
      core.upsertParsed(req.query, muts, tok)
      encodeResponse(PResponse(txn = Some(PTxnContext(
        startTs = req.startTs,
        commitTs = math.max(req.startTs, 0L) + 1)))).result
    } else {
      var sets = Seq.empty[(String, String)]
      var dels = Seq.empty[(String, String)]
      req.mutations.foreach { m =>
        if (m.cond.nonEmpty)
          throw new UnsupportedOperationException(
            "conditional mutations outside an upsert Request are not " +
              "part of the reference API")
        if (m.setNquads.nonEmpty)
          sets ++= core.bareNquadLines(new String(m.setNquads, UTF_8))
        if (m.delNquads.nonEmpty)
          dels ++= core.bareNquadLines(new String(m.delNquads, UTF_8))
        // Mutation.set_json/delete_json carry the array (or one object)
        // directly — wrap into the HTTP JSON-mutation envelope
        def wrap(key: String, js: Array[Byte]): String = {
          val s = new String(js, UTF_8).trim
          if (s.startsWith("[")) s"""{"$key":$s}""" else s"""{"$key":[$s]}"""
        }
        if (m.setJson.nonEmpty)
          sets ++= core.parseMutationBody(wrap("set", m.setJson), isJson = true)._1
        if (m.deleteJson.nonEmpty)
          dels ++= core.parseMutationBody(wrap("delete", m.deleteJson), isJson = true)._2
      }
      val commitNow = req.commitNow || req.mutations.exists(_.commitNow)
      val startTs = Some(req.startTs).filter(_ != 0L)
      core.mutateParsed(sets, dels, commitNow, startTs, tok) match {
        case Some(ts) => // queued — commit later via CommitOrAbort
          encodeResponse(PResponse(
            txn = Some(PTxnContext(startTs = ts)))).result
        case None =>
          encodeResponse(PResponse(txn = Some(PTxnContext(
            startTs = req.startTs,
            commitTs = math.max(req.startTs, 0L) + 1)))).result
      }
    }
  }

  private def alter(op: POperation, tok: Option[String]): Array[Byte] = {
    val body =
      if (op.dropAll) """{"drop_all": true}"""
      else if (op.dropOp != 0) {
        val name = op.dropOp match {
          case 1 => "ALL"
          case 2 => "DATA"
          case 3 => "ATTR"
          case 4 => "TYPE"
          case other => throw new IllegalArgumentException(
            s"unknown drop_op $other")
        }
        s"""{"drop_op": "$name", "drop_value": ${jsonStr(op.dropValue)}}"""
      } else if (op.dropAttr.nonEmpty)
        s"""{"drop_attr": ${jsonStr(op.dropAttr)}}"""
      else op.schema
    core.alterBody(body, tok)
    encodePayload("Success".getBytes(UTF_8))
  }

  private def commitOrAbort(t: PTxnContext,
      tok: Option[String]): Array[Byte] = {
    core.commitTxn(t.startTs, t.aborted, tok)
    encodeTxnContext(
      if (t.aborted) t
      else t.copy(commitTs = t.startTs + 1)).result
  }

  private def jsonStr(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)
}

object GrpcEndpoint {
  /** Malformed wire frame (e.g. compressed flag without a grpc-encoding)
    * — maps to INTERNAL(13), matching grpc-go's handling.
    */
  final case class GrpcProtocolException(msg: String)
      extends RuntimeException(msg)
}
