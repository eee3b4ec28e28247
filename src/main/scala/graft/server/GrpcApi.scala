package graft.server

import java.nio.charset.StandardCharsets.UTF_8

/** The Dgraph client API messages (public dgraph-io/dgo
  * `protos/api.proto` — field numbers below mirror it; the service is
  * `api.Dgraph` with Login/Query/Alter/CommitOrAbort/CheckVersion,
  * reference edgraph/server.go:1346 Query etc.). Hand-modeled because
  * the build excludes a protobuf toolchain; [[Proto]] carries the wire
  * format. Only the client-facing surface — the internal pb.proto
  * (Raft, snapshots, posting lists) is OLTP machinery the Spark engine
  * replaces wholesale.
  */
object GrpcApi {
  import Proto.{Reader, Writer}

  /** api.Mutation: set_json=1 delete_json=2 set_nquads=3 del_nquads=4
    * cond=9 commit_now=14 (repeated NQuad set=5/del=6 are not modeled —
    * dgo clients populate the json/nquads forms).
    */
  final case class PMutation(
      setJson: Array[Byte] = Array.emptyByteArray,
      deleteJson: Array[Byte] = Array.emptyByteArray,
      setNquads: Array[Byte] = Array.emptyByteArray,
      delNquads: Array[Byte] = Array.emptyByteArray,
      cond: String = "",
      commitNow: Boolean = false)

  def decodeMutation(b: Array[Byte]): PMutation = {
    val r = new Reader(b)
    var m = PMutation()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => m = m.copy(setJson = r.readBytes())
      case (2, 2) => m = m.copy(deleteJson = r.readBytes())
      case (3, 2) => m = m.copy(setNquads = r.readBytes())
      case (4, 2) => m = m.copy(delNquads = r.readBytes())
      case (9, 2) => m = m.copy(cond = r.readString())
      case (14, 0) => m = m.copy(commitNow = r.readVarint() != 0)
      case (_, w) => r.skip(w)
    }
    m
  }

  def encodeMutation(m: PMutation): Writer = {
    val w = new Writer
    w.bytes(1, m.setJson); w.bytes(2, m.deleteJson)
    w.bytes(3, m.setNquads); w.bytes(4, m.delNquads)
    w.string(9, m.cond); w.bool(14, m.commitNow)
    w
  }

  /** api.Request: start_ts=1 query=4 vars=5 read_only=6 best_effort=7
    * mutations=12 commit_now=13 resp_format=14 (JSON=0, RDF=1).
    */
  final case class PRequest(
      startTs: Long = 0L,
      query: String = "",
      vars: Map[String, String] = Map.empty,
      readOnly: Boolean = false,
      bestEffort: Boolean = false,
      mutations: Seq[PMutation] = Nil,
      commitNow: Boolean = false,
      respFormat: Int = 0)

  def decodeRequest(b: Array[Byte]): PRequest = {
    val r = new Reader(b)
    var q = PRequest()
    while (r.hasNext) r.readTag() match {
      case (1, 0) => q = q.copy(startTs = r.readVarint())
      case (4, 2) => q = q.copy(query = r.readString())
      case (5, 2) =>
        val (k, v) = Proto.stringMapEntry(r.readBytes())
        q = q.copy(vars = q.vars + (k -> v))
      case (6, 0) => q = q.copy(readOnly = r.readVarint() != 0)
      case (7, 0) => q = q.copy(bestEffort = r.readVarint() != 0)
      case (12, 2) => q = q.copy(mutations = q.mutations :+ decodeMutation(r.readBytes()))
      case (13, 0) => q = q.copy(commitNow = r.readVarint() != 0)
      case (14, 0) => q = q.copy(respFormat = r.readVarint().toInt)
      case (_, w) => r.skip(w)
    }
    q
  }

  def encodeRequest(q: PRequest): Writer = {
    val w = new Writer
    w.uint64(1, q.startTs); w.string(4, q.query); w.stringMap(5, q.vars)
    w.bool(6, q.readOnly); w.bool(7, q.bestEffort)
    q.mutations.foreach(m => w.message(12, encodeMutation(m)))
    w.bool(13, q.commitNow); w.enum0(14, q.respFormat)
    w
  }

  /** api.TxnContext: start_ts=1 commit_ts=2 aborted=3 keys=4 preds=5. */
  final case class PTxnContext(
      startTs: Long = 0L,
      commitTs: Long = 0L,
      aborted: Boolean = false,
      keys: Seq[String] = Nil,
      preds: Seq[String] = Nil)

  def decodeTxnContext(b: Array[Byte]): PTxnContext = {
    val r = new Reader(b)
    var t = PTxnContext()
    while (r.hasNext) r.readTag() match {
      case (1, 0) => t = t.copy(startTs = r.readVarint())
      case (2, 0) => t = t.copy(commitTs = r.readVarint())
      case (3, 0) => t = t.copy(aborted = r.readVarint() != 0)
      case (4, 2) => t = t.copy(keys = t.keys :+ r.readString())
      case (5, 2) => t = t.copy(preds = t.preds :+ r.readString())
      case (_, w) => r.skip(w)
    }
    t
  }

  def encodeTxnContext(t: PTxnContext): Writer = {
    val w = new Writer
    w.uint64(1, t.startTs); w.uint64(2, t.commitTs); w.bool(3, t.aborted)
    w.repeatedString(4, t.keys); w.repeatedString(5, t.preds)
    w
  }

  /** api.Response: json=1 txn=2 uids=12 rdf=13 (latency=3/metrics=4
    * omitted — optional diagnostics).
    */
  final case class PResponse(
      json: Array[Byte] = Array.emptyByteArray,
      txn: Option[PTxnContext] = None,
      uids: Map[String, String] = Map.empty,
      rdf: Array[Byte] = Array.emptyByteArray)

  def encodeResponse(resp: PResponse): Writer = {
    val w = new Writer
    w.bytes(1, resp.json)
    resp.txn.foreach(t => w.message(2, encodeTxnContext(t)))
    w.stringMap(12, resp.uids)
    w.bytes(13, resp.rdf)
    w
  }

  def decodeResponse(b: Array[Byte]): PResponse = {
    val r = new Reader(b)
    var resp = PResponse()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => resp = resp.copy(json = r.readBytes())
      case (2, 2) => resp = resp.copy(txn = Some(decodeTxnContext(r.readBytes())))
      case (12, 2) =>
        val (k, v) = Proto.stringMapEntry(r.readBytes())
        resp = resp.copy(uids = resp.uids + (k -> v))
      case (13, 2) => resp = resp.copy(rdf = r.readBytes())
      case (_, w) => r.skip(w)
    }
    resp
  }

  /** api.Operation: schema=1 drop_attr=2 drop_all=3 drop_op=4
    * (NONE/ALL/DATA/ATTR/TYPE) drop_value=5.
    */
  final case class POperation(
      schema: String = "",
      dropAttr: String = "",
      dropAll: Boolean = false,
      dropOp: Int = 0,
      dropValue: String = "")

  def decodeOperation(b: Array[Byte]): POperation = {
    val r = new Reader(b)
    var o = POperation()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => o = o.copy(schema = r.readString())
      case (2, 2) => o = o.copy(dropAttr = r.readString())
      case (3, 0) => o = o.copy(dropAll = r.readVarint() != 0)
      case (4, 0) => o = o.copy(dropOp = r.readVarint().toInt)
      case (5, 2) => o = o.copy(dropValue = r.readString())
      case (_, w) => r.skip(w)
    }
    o
  }

  def encodeOperation(o: POperation): Writer = {
    val w = new Writer
    w.string(1, o.schema); w.string(2, o.dropAttr); w.bool(3, o.dropAll)
    w.enum0(4, o.dropOp); w.string(5, o.dropValue)
    w
  }

  /** api.LoginRequest: userid=1 password=2 refresh_token=3 namespace=4. */
  final case class PLoginRequest(
      userid: String = "",
      password: String = "",
      refreshToken: String = "",
      namespace: Long = 0L)

  def decodeLoginRequest(b: Array[Byte]): PLoginRequest = {
    val r = new Reader(b)
    var l = PLoginRequest()
    while (r.hasNext) r.readTag() match {
      case (1, 2) => l = l.copy(userid = r.readString())
      case (2, 2) => l = l.copy(password = r.readString())
      case (3, 2) => l = l.copy(refreshToken = r.readString())
      case (4, 0) => l = l.copy(namespace = r.readVarint())
      case (_, w) => r.skip(w)
    }
    l
  }

  def encodeLoginRequest(l: PLoginRequest): Writer = {
    val w = new Writer
    w.string(1, l.userid); w.string(2, l.password)
    w.string(3, l.refreshToken); w.uint64(4, l.namespace)
    w
  }

  /** api.Jwt: access_jwt=1 refresh_jwt=2 — Login's Response.json
    * carries a proto-encoded Jwt (dgo unmarshals it from resp.Json).
    */
  def encodeJwt(accessJwt: String, refreshJwt: String): Array[Byte] = {
    val w = new Writer
    w.string(1, accessJwt); w.string(2, refreshJwt)
    w.result
  }

  def decodeJwt(b: Array[Byte]): (String, String) = {
    val r = new Reader(b)
    var a = ""; var rf = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) => a = r.readString()
      case (2, 2) => rf = r.readString()
      case (_, w) => r.skip(w)
    }
    (a, rf)
  }

  /** api.Payload: Data=1; api.Version: tag=1. */
  def encodePayload(data: Array[Byte]): Array[Byte] = {
    val w = new Writer; w.bytes(1, data); w.result
  }
  def decodePayload(b: Array[Byte]): Array[Byte] = {
    val r = new Reader(b)
    var out = Array.emptyByteArray
    while (r.hasNext) r.readTag() match {
      case (1, 2) => out = r.readBytes()
      case (_, w) => r.skip(w)
    }
    out
  }
  def encodeVersion(tag: String): Array[Byte] = {
    val w = new Writer; w.string(1, tag); w.result
  }
  def decodeVersion(b: Array[Byte]): String = {
    val r = new Reader(b)
    var tag = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) => tag = r.readString()
      case (_, w) => r.skip(w)
    }
    tag
  }
}
