package graft

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SchemaRegistry, TripleFrameStore}
import graft.graphql.{GraphQLEngine, SdlParser}
import graft.server.WsSubscriptions
import graft.sources.RdfSource

/** WebSocket subscription transport (reference graphql/subscription/
  * subscription.go: "graphql-ws" subprotocol, Apollo message types) —
  * exercised end-to-end over a real socket with a minimal RFC 6455
  * client: handshake, masked client frames, connection_init/ack,
  * start → initial data push, mutation → change push, stop → complete.
  */
class WsSubscriptionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  // ---- tiny RFC 6455 client (client frames MUST be masked) ----

  private def handshake(host: String, port: Int): (Socket, InputStream, OutputStream) = {
    val sock = new Socket(host, port)
    sock.setSoTimeout(20000)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    out.write(("GET /graphql HTTP/1.1\r\n" +
      s"Host: $host:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
      "Sec-WebSocket-Protocol: graphql-ws\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val c = in.read()
      if (c == -1) done = true
      else { sb.append(c.toChar); if (sb.endsWith("\r\n\r\n")) done = true }
    }
    val resp = sb.toString
    assert(resp.startsWith("HTTP/1.1 101"), resp)
    // RFC 6455 §1.3 sample key -> fixed accept value
    assert(resp.contains("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="), resp)
    assert(resp.contains("Sec-WebSocket-Protocol: graphql-ws"), resp)
    (sock, in, out)
  }

  private def sendText(out: OutputStream, s: String): Unit = {
    val payload = s.getBytes(UTF_8)
    out.write(0x81) // FIN + text
    val mask = Array[Byte](0x12, 0x34, 0x56, 0x78)
    val n = payload.length
    if (n < 126) out.write(0x80 | n)
    else { out.write(0x80 | 126); out.write(n >>> 8); out.write(n & 0xff) }
    out.write(mask)
    payload.indices.foreach(i => out.write(payload(i) ^ mask(i % 4)))
    out.flush()
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n); var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      assert(r != -1, "eof mid-frame"); off += r
    }
    buf
  }

  /** (opcode, text payload) — server frames are unmasked. */
  private def readMsg(in: InputStream): (Int, String) = {
    val b0 = in.read(); assert(b0 != -1, "eof")
    val b1 = in.read()
    var len: Int = b1 & 0x7f
    if (len == 126) { val e = readN(in, 2); len = ((e(0) & 0xff) << 8) | (e(1) & 0xff) }
    else if (len == 127) {
      val e = readN(in, 8)
      len = e.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)).toInt
    }
    (b0 & 0x0f, new String(readN(in, len), UTF_8))
  }

  /** Read until a message whose type matches, skipping ka frames. */
  private def readType(in: InputStream, t: String): String = {
    var tries = 0
    while (tries < 50) {
      val (op, msg) = readMsg(in)
      if (op == 0x1 && msg.contains(s""""type":"$t"""")) return msg
      tries += 1
    }
    fail(s"no '$t' message arrived")
  }

  test("graphql-ws: init/ack, start pushes initial data, mutation pushes change, stop completes") {
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter("text: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    def triplesFor(v: String) = RdfSource.parse(Seq(
      s"""<0x1> <text> "$v" .""",
      """<0x1> <dgraph.type> "Note" .""").toDF("line")).localCheckpoint()
    val sdl = SdlParser.parse(
      """type Note @withSubscription {
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}""".stripMargin)
    @volatile var triples = triplesFor("v1")
    def engine() = new GraphQLEngine(
      new TripleFrameStore(spark, reg, triples, Map.empty, materialize = false), sdl)

    val ws = new WsSubscriptions(() => engine(), pollMs = 100)
    val port = ws.start()
    try {
      val (sock, in, out) = handshake("127.0.0.1", port)
      sendText(out, """{"type":"connection_init","payload":{}}""")
      readType(in, "connection_ack")
      sendText(out,
        """{"type":"start","id":"1","payload":{"query":"subscription { queryNote { text } }"}}""")
      val first = readType(in, "data")
      assert(first.contains(""""id":"1""""), first)
      assert(first.contains("v1"), first)
      // a mutation swaps the store frame; the next poll tick pushes v2
      triples = triplesFor("v2")
      val second = readType(in, "data")
      assert(second.contains("v2"), second)
      // a bad document answers an error message, not a broken socket
      sendText(out,
        """{"type":"start","id":"2","payload":{"query":"query { queryNote { text } }"}}""")
      val err = readType(in, "error")
      assert(err.contains(""""id":"2""""), err)
      assert(err.contains("subscription"), err)
      sendText(out, """{"type":"stop","id":"1"}""")
      readType(in, "complete")
      sendText(out, """{"type":"connection_terminate"}""")
      sock.close()
    } finally ws.stop()
  }

  test("@auth claims ride the connection_init payload header the SDL names") {
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter("text: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq(
      """<0x1> <text> "classified" .""",
      """<0x1> <dgraph.type> "Note" .""").toDF("line")).localCheckpoint()
    val sdl = SdlParser.parse(
      """type Note @withSubscription
        |    @auth(query: { rule: "{$ROLE: { eq: \"admin\" } }"}) {
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}
        |# Dgraph.Authorization {"VerificationKey":"topsecret","Header":"X-Auth","Namespace":"","Algo":"HS256"}
        |""".stripMargin)
    def hs256(payload: String): String = {
      def b64(x: Array[Byte]) = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(x)
      val h = b64("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
      val p = b64(payload.getBytes(UTF_8))
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        "topsecret".getBytes(UTF_8), "HmacSHA256"))
      s"$h.$p." + b64(mac.doFinal(s"$h.$p".getBytes(UTF_8)))
    }
    def engine() = new GraphQLEngine(
      new TripleFrameStore(spark, reg, triples, Map.empty, materialize = false), sdl)
    val ws = new WsSubscriptions(() => engine(), pollMs = 100)
    val port = ws.start()
    try {
      // admin-role token in the SDL-named header → data flows
      val (sock1, in1, out1) = handshake("127.0.0.1", port)
      sendText(out1,
        s"""{"type":"connection_init","payload":{"X-Auth":"${hs256("""{"ROLE":"admin"}""")}"}}""")
      readType(in1, "connection_ack")
      sendText(out1,
        """{"type":"start","id":"1","payload":{"query":"subscription { queryNote { text } }"}}""")
      val data = readType(in1, "data")
      assert(data.contains("classified"), data)
      sock1.close()
      // wrong role → auth fails closed: empty result, not an error leak
      val (sock2, in2, out2) = handshake("127.0.0.1", port)
      sendText(out2,
        s"""{"type":"connection_init","payload":{"X-Auth":"${hs256("""{"ROLE":"viewer"}""")}"}}""")
      readType(in2, "connection_ack")
      sendText(out2,
        """{"type":"start","id":"1","payload":{"query":"subscription { queryNote { text } }"}}""")
      val denied = readType(in2, "data")
      assert(!denied.contains("classified"), denied)
      sock2.close()
    } finally ws.stop()
  }
}
