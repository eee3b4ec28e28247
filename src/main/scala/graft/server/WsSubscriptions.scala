package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.graphql.{GBool, GList, GNum, GObj, GNull, GStr, GVal, GraphQLEngine, Subscription}

/** WebSocket transport for GraphQL subscriptions — the half the poll API
  * (graphql/Subscription.scala) left out. The reference serves
  * subscriptions over a websocket speaking Apollo's
  * subscriptions-transport-ws protocol (graphql/subscription/
  * subscription.go: subprotocol "graphql-ws", GQL_CONNECTION_INIT /
  * GQL_START / GQL_DATA / GQL_STOP message types), re-executing each
  * subscribed query on a poll interval and pushing only on change.
  *
  * This server implements RFC 6455 directly over a `ServerSocket` — the
  * JDK's `com.sun.net.httpserver` (which carries the rest of the front
  * door, HttpEndpoint.scala) cannot hijack a connection for an upgrade,
  * and the build excludes websocket libraries. The frame layer supports
  * what the protocol needs: client-masked text frames in, unmasked text
  * frames out, ping/pong, close, 16- and 64-bit extended lengths.
  * Fragmented continuation frames are rejected (protocol messages are
  * single-frame in every real client).
  *
  * Message flow (Apollo protocol, reference parity):
  *   -> {"type":"connection_init","payload":{<auth headers>}}
  *   <- {"type":"connection_ack"}  then  {"type":"ka"}
  *   -> {"type":"start","id":N,"payload":{"query":…,"variables":…}}
  *   <- {"type":"data","id":N,"payload":{"data":{…}}}   (now + on change)
  *   -> {"type":"stop","id":N}      <- {"type":"complete","id":N}
  *   -> {"type":"connection_terminate"}                 (socket closes)
  * Validation failures answer {"type":"error","id":N,"payload":
  * {"message":…}} like the reference's GQL_ERROR.
  *
  * `engineFor` is re-invoked per poll so each tick sees the CURRENT
  * committed frame (HttpEndpoint mutations swap an immutable frame; a
  * subscription must observe the swap). JWT claims ride the
  * connection_init payload: the header the SDL's `# Dgraph.Authorization`
  * names (fallback X-Dgraph-AccessToken / Authorization), matching how
  * the reference attaches auth to the websocket init payload
  * (graphql/admin/http.go AttachAuthToken on init).
  *
  * Scale note: like the poll API, a subscription result is client-sized
  * by construction — the driver-side collect inside Subscription.poll is
  * metadata-scale, never a data-path collect.
  */
final class WsSubscriptions(
    engineFor: () => GraphQLEngine,
    pollMs: Long = 200L) {

  private val M = new ObjectMapper()
  @volatile private var server: ServerSocket = _
  @volatile private var running = false

  def start(port: Int = 0): Int = {
    server = new ServerSocket()
    server.bind(new InetSocketAddress(port))
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "graft-ws-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => () } // closed during accept
      }
    }, "graft-ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    if (server != null) server.close()
  }

  // ---- one connection ----

  private def serve(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      val headers = readHandshake(in)
      val key = headers.getOrElse("sec-websocket-key",
        throw new IllegalArgumentException("missing Sec-WebSocket-Key"))
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      val proto =
        if (headers.contains("sec-websocket-protocol"))
          "Sec-WebSocket-Protocol: graphql-ws\r\n"
        else ""
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n" + proto + "\r\n").getBytes(UTF_8))
      out.flush()
      connectionLoop(in, out)
    } catch {
      case t: Throwable => // visible: a broken connection must not vanish
        System.err.println(s"[ws] connection error: ${t.getClass.getName}: ${t.getMessage}")
    }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  /** Per-connection protocol state + poll thread. */
  private def connectionLoop(in: InputStream, out: OutputStream): Unit = {
    val writeLock = new Object
    def send(json: String): Unit = writeLock.synchronized {
      writeFrame(out, 0x1, json.getBytes(UTF_8))
    }
    // id -> (subscription, claims); polled by the ticker below
    val subs = scala.collection.concurrent.TrieMap
      .empty[String, Subscription]
    @volatile var initPayload = Map.empty[String, String]
    @volatile var open = true

    val ticker = new Thread(() => {
      while (open) {
        Thread.sleep(pollMs)
        subs.foreach { case (id, sub) =>
          try sub.poll(engineFor()).foreach(df => send(dataMsg(id, df)))
          catch { case t: Throwable => send(errorMsg(id, t.getMessage)) }
        }
      }
    }, "graft-ws-poll")
    ticker.setDaemon(true)
    ticker.start()

    try {
      var done = false
      while (!done) {
        readFrame(in) match {
          case None => done = true
          case Some((0x8, _)) => // close
            writeLock.synchronized { writeFrame(out, 0x8, Array.emptyByteArray) }
            done = true
          case Some((0x9, payload)) => // ping -> pong
            writeLock.synchronized { writeFrame(out, 0xA, payload) }
          case Some((0xA, _)) => // pong: ignore
          case Some((_, payload)) =>
            val n = M.readTree(new String(payload, UTF_8))
            val id = Option(n.get("id")).map(_.asText).getOrElse("")
            n.get("type").asText match {
              case "connection_init" =>
                initPayload = Option(n.get("payload")).filter(_.isObject)
                  .map { p =>
                    val it = p.fields()
                    val b = Map.newBuilder[String, String]
                    while (it.hasNext) {
                      val e = it.next()
                      b += e.getKey.toLowerCase -> e.getValue.asText
                    }
                    b.result()
                  }.getOrElse(Map.empty)
                send("""{"type":"connection_ack"}""")
                send("""{"type":"ka"}""")
              case "start" =>
                try {
                  val p = n.get("payload")
                  val vars = Option(p.get("variables")).filter(!_.isNull)
                    .map(gvals).getOrElse(Map.empty[String, GVal])
                  val eng = engineFor()
                  val claims = authToken(eng, initPayload).map(eng.claimsFor)
                    .getOrElse(Map.empty[String, String])
                  val sub = eng.subscribe(p.get("query").asText, vars, claims)
                  // first tick now, like the reference's initial result push
                  sub.poll(eng).foreach(df => send(dataMsg(id, df)))
                  subs.put(id, sub)
                } catch {
                  case t: Throwable => send(errorMsg(id, t.getMessage))
                }
              case "stop" =>
                subs.remove(id)
                send(s"""{"type":"complete","id":${M.writeValueAsString(id)}}""")
              case "connection_terminate" => done = true
              case other => send(errorMsg(id, s"unsupported message type '$other'"))
            }
        }
      }
    } finally { open = false }
  }

  /** Auth token for @auth claims out of the init payload: the header the
    * SDL names, else the ACL token header, else a bearer Authorization.
    */
  private def authToken(eng: GraphQLEngine,
      init: Map[String, String]): Option[String] =
    eng.authHeaderName.map(_.toLowerCase).flatMap(init.get)
      .orElse(init.get("x-dgraph-accesstoken"))
      .orElse(init.get("authorization").map(_.stripPrefix("Bearer ").trim))

  private def dataMsg(id: String, df: org.apache.spark.sql.DataFrame): String = {
    val data = M.createObjectNode()
    df.collect().map(r => (r.getString(0), r.getString(2)))
      .groupBy(_._1).toSeq.sortBy(_._1).foreach { case (block, rs) =>
        val arr = data.putArray(block)
        rs.foreach { case (_, j) => arr.add(M.readTree(j)) }
      }
    val payload = M.createObjectNode()
    payload.set[JsonNode]("data", data)
    val root = M.createObjectNode()
    root.put("type", "data")
    root.put("id", id)
    root.set[JsonNode]("payload", payload)
    M.writeValueAsString(root)
  }

  private def errorMsg(id: String, msg: String): String = {
    val payload = M.createObjectNode()
    payload.put("message", String.valueOf(msg))
    val root = M.createObjectNode()
    root.put("type", "error")
    root.put("id", id)
    root.set[JsonNode]("payload", payload)
    M.writeValueAsString(root)
  }

  private def gvals(n: JsonNode): Map[String, GVal] = {
    def conv(v: JsonNode): GVal =
      if (v.isNull) GNull
      else if (v.isBoolean) GBool(v.asBoolean)
      else if (v.isNumber) GNum(v.asText)
      else if (v.isArray) {
        val it = v.elements(); val b = Seq.newBuilder[GVal]
        while (it.hasNext) b += conv(it.next())
        GList(b.result())
      } else if (v.isObject) {
        val it = v.fields(); val b = Seq.newBuilder[(String, GVal)]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> conv(e.getValue) }
        GObj(b.result())
      } else GStr(v.asText)
    val it = n.fields()
    val out = Map.newBuilder[String, GVal]
    while (it.hasNext) { val e = it.next(); out += e.getKey -> conv(e.getValue) }
    out.result()
  }

  // ---- RFC 6455 framing ----

  /** HTTP upgrade request: header lines until the blank line. Checks
    * the terminator AFTER each append — reading one byte past \r\n\r\n
    * would block forever (the client sends nothing until the 101).
    */
  private def readHandshake(in: InputStream): Map[String, String] = {
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val c = in.read()
      if (c == -1) done = true
      else {
        sb.append(c.toChar)
        if (sb.endsWith("\r\n\r\n")) done = true
      }
    }
    sb.toString.split("\r\n").drop(1).filter(_.contains(":")).map { line =>
      val i = line.indexOf(':')
      line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
    }.toMap
  }

  /** One frame: Some((opcode, unmasked payload)), None on EOF. */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 == -1) return None
    val opcode = b0 & 0x0f
    if (opcode == 0x0)
      throw new IllegalArgumentException("continuation frames unsupported")
    val b1 = in.read()
    if (b1 == -1) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) {
      val ext = readN(in, 2)
      len = (ext(0) & 0xffL) << 8 | (ext(1) & 0xffL)
    } else if (len == 127) {
      val ext = readN(in, 8)
      len = ext.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    if (len > (1L << 24))
      throw new IllegalArgumentException(s"frame too large: $len")
    val mask = if (masked) readN(in, 4) else Array.emptyByteArray
    val payload = readN(in, len.toInt)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
      }
    }
    Some((opcode, payload))
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r == -1) throw new java.io.EOFException("ws stream closed mid-frame")
      off += r
    }
    buf
  }

  /** Server frames are unmasked (RFC 6455 §5.1). */
  private def writeFrame(out: OutputStream, opcode: Int,
      payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode)
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < 65536) {
      out.write(126); out.write(n >>> 8); out.write(n & 0xff)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }
}
