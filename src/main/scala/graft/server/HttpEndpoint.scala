package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Acl, GraphStore, SchemaRegistry, TripleFrameStore}
import graft.dql.Parser
import graft.exec.DqlExecutor
import graft.graphql.{GqlSchema, GqlParser, GVal, GStr, GNum, GBool, GList, GObj, GraphQLEngine, SdlParser}
import graft.operators.Mutations
import graft.sources.RdfSource

/** The reference's HTTP front door re-expressed over the Spark engine
  * (dgraph/cmd/alpha/run.go:484-535 route table):
  *
  *   POST /query   DQL — raw text, or JSON `{"query":…,"variables":…}`
  *   POST /mutate  `{ set { <N-Quads> } delete { <N-Quads> } }` or the
  *                 JSON mutation form `{"set":[{…}],"delete":[…]}`
  *   POST /alter   DQL schema payload (predicates + types)
  *   POST /graphql JSON `{"query":…,"variables":…}`
  *   POST /admin/schema  replace the GraphQL SDL
  *   POST /login   `{"userid":…,"password":…}` → accessJWT (when ACL on)
  *   GET  /health
  *
  * Responses use the reference's `{"data": …}` envelope; errors the
  * `{"errors":[{"message":…}]}` one. `X-Dgraph-AccessToken` gates reads
  * (unauthorized predicates resolve empty via [[Acl.storeFor]]) and
  * writes ([[Acl.authorizeMutation]] errors with the blocked list).
  *
  * Built on the JDK's own `com.sun.net.httpserver` — zero dependencies,
  * which is the point: gRPC needs a protobuf toolchain this build
  * excludes (SURVEY §2.1 keeps it out of scope; this endpoint closes
  * the HTTP half). Serving model: the endpoint is the INTERACTIVE front
  * door — each response is a driver-side collect of an engine frame,
  * inherently bounded by HTTP response size. Batch-scale work goes
  * through the library API; at 100 TB this server fronts the same
  * engine and the queries it proxies keep their distributed plans.
  *
  * Mutations swap an immutable current-triples frame (localCheckpoint'd
  * so each swap materializes once), mirroring how the engine's mutation
  * operators are pure frame transforms.
  */
final class HttpEndpoint(
    spark: SparkSession,
    schema0: SchemaRegistry,
    triples0: DataFrame,
    gqlSchema0: GqlSchema = SdlParser.tpch,
    acl: Option[Acl] = None,
    facetKeys: Map[String, Seq[(String, String)]] = Map.empty) {

  private val M = new ObjectMapper()
  @volatile private var schema = schema0
  @volatile private var triples = triples0.localCheckpoint()
  @volatile private var gqlSchema = gqlSchema0
  @volatile private var sdlText = "" // raw SDL for getGQLSchema
  @volatile private var server: HttpServer = _
  private val writeLock = new Object

  private def store: GraphStore =
    new TripleFrameStore(spark, schema, triples, facetKeys,
      materialize = false)

  /** Store view for the request's access token: ACL off → full store;
    * ACL on → unauthorized predicates resolve empty (worker/acl.go).
    */
  private def storeFor(ex: HttpExchange): GraphStore = acl match {
    case None => store
    case Some(a) =>
      Option(ex.getRequestHeaders.getFirst("X-Dgraph-AccessToken")) match {
        case Some(tok) => a.storeFor(store, tok)
        case None => throw Acl.AclException("no accessJwt available")
      }
  }

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", handler { _ =>
      """[{"status":"healthy","instance":"alpha"}]"""
    })
    server.createContext("/query", handler { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val (q, vars) = contentType(ex) match {
        case ct if ct.contains("application/json") =>
          val n = M.readTree(body)
          (n.get("query").asText, jsonVars(n.get("variables")))
        case _ => (body, Map.empty[String, String])
      }
      val rows = new DqlExecutor(storeFor(ex))
        .jsonAllAst(Parser.parseWithVars(q, vars)).collect()
      envelope(rows.map(r => (r.getString(0), r.getString(2))))
    })
    server.createContext("/mutate", handler { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      writeLock.synchronized {
        val (sets, dels) =
          if (contentType(ex).contains("application/json"))
            jsonMutation(body)
          else rdfMutation(body)
        // graphql-reserved predicates may not be user-mutated (reference
        // x/keys.go otherReservedPredicate + edgraph/server.go:2295 —
        // NOT the whole dgraph. prefix: dgraph.type stays mutable)
        (sets.map(_._2) ++ dels.map(_._2))
          .find(HttpEndpoint.graphqlReserved.contains)
          .foreach(p => throw new IllegalArgumentException(
            s"Cannot mutate graphql reserved predicate $p"))
        acl.foreach { a =>
          val tok = Option(
            ex.getRequestHeaders.getFirst("X-Dgraph-AccessToken"))
            .getOrElse(throw Acl.AclException("no accessJwt available"))
          a.authorizeMutation(tok,
            sets.map(_._2) ++ dels.map(_._2))
        }
        import spark.implicits._
        var next = triples
        if (sets.nonEmpty)
          next = Mutations.applySet(next,
            RdfSource.parse(sets.map(_._1).toDF("line")))
        if (dels.nonEmpty) {
          // delete lines allow wildcards — `<0x1> <p> * .` drops the
          // predicate, `<0x1> * * .` the whole node (S * * semantics);
          // request bodies are metadata-sized, parse driver-side
          val delRe = """<0x([0-9a-fA-F]+)>\s+(?:<([^>]+)>|\*)""".r
          val pairs = dels.map(_._1).flatMap(l =>
            delRe.findFirstMatchIn(l).map(m =>
              (java.lang.Long.parseLong(m.group(1), 16),
                Option(m.group(2)).getOrElse("*"))))
          next = Mutations.applyDelete(next,
            pairs.toDF("subject", "predicate"))
        }
        triples = next.localCheckpoint()
      }
      """{"data":{"code":"Success","message":"Done"}}"""
    })
    server.createContext("/alter", handler { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      writeLock.synchronized {
        // JSON drop operations (reference edgraph/server.go:369 Alter:
        // drop_all / drop_op DATA|ATTR|TYPE / drop_attr) vs a schema
        // payload — the reference's /alter accepts both forms
        val node =
          try Option(M.readTree(body)).filter(_.isObject)
          catch { case _: Exception => None }
        node.filter(n => Seq("drop_all", "drop_attr", "drop_op")
            .exists(n.has)) match {
          case Some(n) => applyDrop(n)
          case None => schema = schema.alter(body)
        }
      }
      """{"data":{"code":"Success","message":"Done"}}"""
    })
    server.createContext("/graphql", handler { ex =>
      val n = M.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val vars = Option(n.get("variables")).filter(!_.isNull)
        .map(jsonGVals).getOrElse(Map.empty)
      val eng = new GraphQLEngine(storeFor(ex), gqlSchema)
      val rows = eng.json(n.get("query").asText, vars).collect()
      envelope(rows.map(r => (r.getString(0), r.getString(2))))
    })
    server.createContext("/admin/schema", handler { ex =>
      val sdl = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      writeLock.synchronized { gqlSchema = SdlParser.parse(sdl); sdlText = sdl }
      """{"data":{"code":"Success","message":"Done"}}"""
    })
    // the reference's GraphQL admin service (graphql/admin/admin.go):
    // getGQLSchema / updateGQLSchema / health are the workhorse ops —
    // admin documents are tiny, matched directly
    server.createContext("/admin", handler { ex =>
      if (ex.getRequestURI.getPath != "/admin")
        throw new IllegalArgumentException("unknown admin path")
      val q = M.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        .get("query").asText
      if (q.contains("getGQLSchema"))
        s"""{"data":{"getGQLSchema":{"schema":${M.writeValueAsString(sdlText)}}}}"""
      else if (q.contains("updateGQLSchema")) {
        val sch = """schema\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findFirstMatchIn(q).map(_.group(1)
            .replace("\\n", "\n").replace("\\\"", "\"")
            .replace("\\\\", "\\"))
          .getOrElse(throw new IllegalArgumentException(
            "updateGQLSchema needs input: {set: {schema: \"...\"}}"))
        writeLock.synchronized {
          gqlSchema = SdlParser.parse(sch); sdlText = sch
        }
        """{"data":{"updateGQLSchema":{"gqlSchema":{"id":"0x1"}}}}"""
      } else if (q.contains("health"))
        """{"data":{"health":[{"status":"healthy","instance":"alpha"}]}}"""
      else throw new IllegalArgumentException(
        "unsupported admin operation (getGQLSchema / updateGQLSchema / health)")
    })
    server.createContext("/login", handler { ex =>
      val a = acl.getOrElse(throw Acl.AclException("ACL is not enabled"))
      val n = M.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val jwt = a.login(n.get("userid").asText, n.get("password").asText)
      s"""{"data":{"accessJWT":${M.writeValueAsString(jwt)}}}"""
    })
    server.setExecutor(null) // serial executor: one request at a time
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** Current triples frame (tests + snapshotting). */
  def currentTriples: DataFrame = triples

  // ---- helpers ----

  private def contentType(ex: HttpExchange): String =
    Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")

  /** `{"$var": "value"}` (reference api.Request.Vars — string-valued,
    * `$`-prefixed; unprefixed keys are tolerated and prefixed).
    */
  private def jsonVars(n: JsonNode): Map[String, String] =
    if (n == null || n.isNull) Map.empty
    else {
      val it = n.fields()
      val out = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        val k = if (e.getKey.startsWith("$")) e.getKey else "$" + e.getKey
        out += k -> e.getValue.asText
      }
      out.result()
    }

  private def jsonGVals(n: JsonNode): Map[String, GVal] = {
    def conv(v: JsonNode): GVal = v match {
      case _ if v.isTextual => GStr(v.asText)
      case _ if v.isNumber => GNum(v.asText)
      case _ if v.isBoolean => GBool(v.asBoolean)
      case _ if v.isArray =>
        GList((0 until v.size).map(i => conv(v.get(i))))
      case _ if v.isObject =>
        val it = v.fields()
        val fs = Seq.newBuilder[(String, GVal)]
        while (it.hasNext) { val e = it.next(); fs += e.getKey -> conv(e.getValue) }
        GObj(fs.result())
      case _ => GStr(v.asText)
    }
    val it = n.fields()
    val out = Map.newBuilder[String, GVal]
    while (it.hasNext) { val e = it.next(); out += e.getKey -> conv(e.getValue) }
    out.result()
  }

  /** `{ set { … } delete { … } }` RDF mutation body → (line, predicate)
    * pairs per op (predicates feed the ACL write check).
    */
  /** Drop operations (reference edgraph/server.go:369-447): drop_all
    * wipes data AND schema; drop_op DATA wipes data only; drop_attr /
    * drop_op ATTR removes one predicate's triples + schema entry;
    * drop_op TYPE removes a type definition (never its nodes). Error
    * messages mirror the reference's validations. Caller holds
    * writeLock.
    */
  private def applyDrop(n: JsonNode): Unit = {
    val dropAll = Option(n.get("drop_all")).exists(_.asBoolean)
    val dropOp = Option(n.get("drop_op")).map(_.asText).getOrElse("NONE")
    val dropValue = Option(n.get("drop_value")).map(_.asText).getOrElse("")
    if (dropAll && dropOp == "DATA")
      throw new IllegalArgumentException(
        "Only one of DropAll and DropData can be true")
    if (dropAll || dropOp == "ALL") {
      if (dropOp == "ALL" && dropValue.nonEmpty)
        throw new IllegalArgumentException(
          "If DropOp is set to ALL, DropValue must be empty")
      triples = triples.limit(0).localCheckpoint()
      schema = new SchemaRegistry(Map.empty, Map.empty)
      gqlSchema = SdlParser.parse("")
      sdlText = ""
    } else if (dropOp == "DATA") {
      if (dropValue.nonEmpty)
        throw new IllegalArgumentException(
          "If DropOp is set to DATA, DropValue must be empty")
      triples = triples.limit(0).localCheckpoint()
    } else {
      val attr = Option(n.get("drop_attr")).map(_.asText).filter(_.nonEmpty)
        .orElse(if (dropOp == "ATTR") Some(dropValue) else None)
      attr match {
        case Some(a) =>
          if (a.isEmpty) throw new IllegalArgumentException(
            "If DropOp is set to ATTR, DropValue must be set")
          if (a.startsWith("dgraph."))
            throw new IllegalArgumentException(
              s"predicate $a is pre-defined and is not allowed to be dropped")
          triples = triples
            .filter(org.apache.spark.sql.functions.col("predicate") =!= a)
            .localCheckpoint()
          schema = new SchemaRegistry(schema.predicates - a, schema.types)
        case None if dropOp == "TYPE" =>
          if (dropValue.isEmpty) throw new IllegalArgumentException(
            "If DropOp is set to TYPE, DropValue must be set")
          schema = new SchemaRegistry(schema.predicates,
            schema.types - dropValue)
        case None => throw new IllegalArgumentException(
          "Operation must have at least one field set")
      }
    }
  }

  private def rdfMutation(body: String): (Seq[(String, String)], Seq[(String, String)]) = {
    def block(name: String): Seq[(String, String)] =
      s"""(?s)$name\\s*\\{(.*?)\\}""".r.findFirstMatchIn(body)
        .map(_.group(1).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
        .map { l =>
          // predicate = the 2nd whitespace token; the subject may be a
          // blank node (_:x) with no angle brackets, so counting <...>
          // matches mis-attributed the predicate (and let blank-subject
          // sets slip past the per-predicate guards)
          l -> l.split("\\s+").lift(1)
            .map(_.stripPrefix("<").stripSuffix(">")).getOrElse("*")
        }
    (block("set"), block("delete"))
  }

  /** JSON mutation `{"set":[{"uid":"0x1","name":"x"},…]}` → N-Quad
    * lines through the same path (reference mutationHandler JSON arm).
    */
  private def jsonMutation(body: String): (Seq[(String, String)], Seq[(String, String)]) = {
    def lines(arrName: String): Seq[(String, String)] = {
      val arr = Option(M.readTree(body).get(arrName)).filter(_.isArray)
        .map(a => (0 until a.size).map(a.get)).getOrElse(Nil)
      arr.flatMap { o =>
        val uid = Option(o.get("uid")).map(_.asText).getOrElse(
          throw new IllegalArgumentException("JSON mutation needs uid"))
        val it = o.fields()
        val out = Seq.newBuilder[(String, String)]
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey != "uid")
            out += (s"""<$uid> <${e.getKey}> "${e.getValue.asText}" ."""
              -> e.getKey)
        }
        out.result()
      }
    }
    (lines("set"), lines("delete"))
  }

  /** Group (block, json) rows into the `{"data": {...}}` envelope. */
  private def envelope(rows: Seq[(String, String)]): String = {
    val data = M.createObjectNode()
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (block, rs) =>
      val arr = data.putArray(block)
      rs.foreach { case (_, j) => arr.add(M.readTree(j)) }
    }
    val root = M.createObjectNode()
    root.set[JsonNode]("data", data)
    M.writeValueAsString(root)
  }

  /** Wrap a handler with the reference's error envelope. */
  private def handler(f: HttpExchange => String)
      : com.sun.net.httpserver.HttpHandler = { ex =>
    val (code, body) =
      try (200, f(ex))
      catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          (200, s"""{"errors":[{"message":${M.writeValueAsString(msg)}}]}""")
      }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

object HttpEndpoint {
  /** Predicates whose VALUES only internal writers may touch (reference
    * x/keys.go:796 otherReservedPredicate): a subset of the dgraph.
    * namespace — dgraph.type and the ACL predicates are managed through
    * their own paths and stay out of this list.
    */
  val graphqlReserved: Set[String] = Set(
    "dgraph.graphql.xid", "dgraph.graphql.schema", "dgraph.drop.op",
    "dgraph.graphql.p_query", "dgraph.namespace.id", "dgraph.namespace.name")
}
