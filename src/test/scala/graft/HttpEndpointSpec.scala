package graft

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Acl, SchemaRegistry}
import graft.graphql.SdlParser
import graft.server.HttpEndpoint
import graft.sources.RdfSource

/** The HTTP front door (reference dgraph/cmd/alpha/run.go route table):
  * /query /mutate /alter /graphql /admin/schema /login /health over the
  * JDK http server, `{"data":…}` / `{"errors":…}` envelopes,
  * X-Dgraph-AccessToken ACL gating on reads and writes.
  */
class HttpEndpointSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def call(port: Int, path: String, method: String = "POST",
      body: String = "", contentType: String = "application/json",
      token: Option[String] = None,
      headers: Map[String, String] = Map.empty): String = {
    val c = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setRequestProperty("Content-Type", contentType)
    token.foreach(c.setRequestProperty("X-Dgraph-AccessToken", _))
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (method == "POST") {
      c.setDoOutput(true)
      c.getOutputStream.write(body.getBytes(UTF_8))
    }
    val s = new String(c.getInputStream.readAllBytes(), UTF_8)
    c.disconnect()
    s
  }

  private def endpoint(): HttpEndpoint = {
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |hsal: int @index(int) .
        |""".stripMargin)
    new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""",
        """<0x1> <hsal> "100" .""",
        """<0x1> <dgraph.type> "HEmp" .""",
        """<0x2> <hname> "bob" .""",
        """<0x2> <hsal> "200" .""",
        """<0x2> <dgraph.type> "HEmp" .""").toDF("line")),
      SdlParser.parse(
        """type HEmp {
          |  id: ID!
          |  hname: String @search(by: [exact])
          |  hsal: Int @search
          |}""".stripMargin))
  }

  test("health, DQL /query (raw + JSON vars), /graphql, data envelope") {
    val ep = endpoint()
    val port = ep.start()
    try {
      assert(call(port, "/health", method = "GET").contains("healthy"))
      // raw DQL body
      val q1 = call(port, "/query",
        body = "{ q(func: has(hname)) { hname hsal } }",
        contentType = "application/dql")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val d1 = m.readTree(q1).get("data").get("q")
      assert(d1.size == 2)
      // JSON body with variables ($-prefix optional, like the reference)
      val q2 = call(port, "/query", body =
        """{"query": "query q($min: int) { q(func: ge(hsal, $min)) { hname } }",
          | "variables": {"min": "150"}}""".stripMargin)
      val d2 = m.readTree(q2).get("data").get("q")
      assert(d2.size == 1 && d2.get(0).get("hname").asText == "bob")
      // GraphQL endpoint
      val g = call(port, "/graphql", body =
        """{"query": "query { queryHEmp(filter: { hsal: { ge: 150 } }) { hname } }"}""")
      val gd = m.readTree(g).get("data").get("queryHEmp")
      assert(gd.size == 1 && gd.get(0).get("hname").asText == "bob")
      // introspection through the same endpoint
      val i = call(port, "/graphql", body =
        """{"query": "query { __schema { queryType { name } } }"}""")
      assert(m.readTree(i).get("data").get("__schema")
        .get(0).get("queryType").get("name").asText == "Query")
      // parse errors come back as the errors envelope, not a 500
      assert(call(port, "/query", body = "{ q(func: ",
        contentType = "application/dql").contains("errors"))
    } finally ep.stop()
  }

  test("/mutate set + wildcard delete, /alter extends the schema") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      // RDF set block
      call(port, "/mutate", contentType = "application/rdf", body =
        """{ set {
          |  <0x3> <hname> "cat" .
          |  <0x3> <hsal> "300" .
          |  <0x3> <dgraph.type> "HEmp" .
          |} }""".stripMargin)
      val q = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql")).get("data").get("q")
      assert(q.size == 3)
      // wildcard delete: S * * drops the whole node
      call(port, "/mutate", contentType = "application/rdf", body =
        "{ delete { <0x3> * * . } }")
      assert(m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql")).get("data").get("q").size == 2)
      // JSON mutation form
      call(port, "/mutate", body =
        """{"set": [{"uid": "0x4", "hname": "dot", "dgraph.type": "HEmp"}]}""")
      assert(m.readTree(call(port, "/query",
        body = """{ q(func: eq(hname, "dot")) { hname } }""",
        contentType = "application/dql")).get("data").get("q").size == 1)
      // /alter adds a predicate usable immediately
      call(port, "/alter", contentType = "application/dql",
        body = "hnick: string @index(exact) .")
      call(port, "/mutate", contentType = "application/rdf", body =
        """{ set { <0x1> <hnick> "annie" . } }""")
      assert(m.readTree(call(port, "/query",
        body = """{ q(func: eq(hnick, "annie")) { hnick } }""",
        contentType = "application/dql")).get("data").get("q")
        .get(0).get("hnick").asText == "annie")
    } finally ep.stop()
  }

  test("reserved namespace: graphql-reserved mutation + dgraph.-prefixed alters rejected") {
    val ep = endpoint()
    val port = ep.start()
    try {
      // mutation of a graphql-reserved predicate errors with the
      // reference's message (query/mutation_test.go:24); dgraph.type
      // stays mutable (used by the passing /mutate test above)
      val e1 = call(port, "/mutate", contentType = "application/rdf",
        body = """{ set { _:x <dgraph.graphql.schema> "df" . } }""")
      assert(e1.contains("Cannot mutate graphql reserved predicate dgraph.graphql.schema"))
      // altering a dgraph.-prefixed TYPE or PREDICATE fails
      // (query/mutation_test.go:29)
      val e2 = call(port, "/alter", contentType = "application/dql",
        body = "type dgraph.Person { name }\nname: string .")
      assert(e2.contains("Can't alter type `dgraph.Person`"))
      val e3 = call(port, "/alter", contentType = "application/dql",
        body = "dgraph.name: string .")
      assert(e3.contains("Can't alter predicate `dgraph.name`"))
      // sanity: a normal alter still succeeds after the rejections
      assert(call(port, "/alter", contentType = "application/dql",
        body = "hother: string .").contains("Success"))
    } finally ep.stop()
  }

  test("/alter drop operations: drop_attr, drop_op DATA, drop_all, validation errors") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def nDocs(pred: String): Int = {
        val q = m.readTree(call(port, "/query",
          body = s"{ q(func: has($pred)) { $pred } }",
          contentType = "application/dql")).get("data").get("q")
        if (q == null) 0 else q.size
      }
      assert(nDocs("hname") == 2 && nDocs("hsal") == 2)
      // drop one predicate: its triples AND schema entry go
      call(port, "/alter", body = """{"drop_attr": "hsal"}""")
      assert(nDocs("hname") == 2)
      // the dropped predicate resolves EMPTY (schema entry gone, triples
      // gone) rather than erroring -- has() on an absent tablet is empty
      val dropped = call(port, "/query", body = "{ q(func: has(hsal)) { hsal } }",
        contentType = "application/dql")
      assert(!dropped.contains("hsal\":") && !dropped.contains("0x"))
      // pre-defined predicates may not be dropped
      assert(call(port, "/alter", body = """{"drop_attr": "dgraph.type"}""")
        .contains("pre-defined"))
      // drop_op DATA wipes data, keeps schema: re-mutate works
      call(port, "/alter", body = """{"drop_op": "DATA"}""")
      assert(nDocs("hname") == 0)
      call(port, "/mutate", contentType = "application/rdf",
        body = """{ set { <0x9> <hname> "zed" . } }""")
      assert(nDocs("hname") == 1)
      // both at once is the reference's error
      assert(call(port, "/alter", body = """{"drop_all": true, "drop_op": "DATA"}""")
        .contains("Only one of DropAll and DropData can be true"))
      // drop_all wipes schema AND data: nothing resolves
      call(port, "/alter", body = """{"drop_all": true}""")
      val wiped = call(port, "/query", body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql")
      assert(!wiped.contains("zed"))
    } finally ep.stop()
  }

  test("/admin GraphQL service: updateGQLSchema swaps the live schema, getGQLSchema returns it") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      assert(call(port, "/admin",
        body = """{"query":"query { health { status } }"}""")
        .contains("healthy"))
      // push a new SDL through the admin mutation (the reference's
      // updateGQLSchema workflow, graphql/admin/admin.go)
      val newSdl = "type HEmp { id: ID! hname: String @search(by: [exact]) }"
      call(port, "/admin", body = m.writeValueAsString {
        val o = m.createObjectNode()
        o.put("query",
          s"""mutation { updateGQLSchema(input: { set: { schema: "$newSdl" } }) {
             |  gqlSchema { id } } }""".stripMargin)
      })
      val got = m.readTree(call(port, "/admin",
        body = """{"query":"query { getGQLSchema { schema } }"}"""))
        .get("data").get("getGQLSchema").get("schema").asText
      assert(got == newSdl)
      // the swapped schema serves /graphql immediately
      val g = call(port, "/graphql", body =
        """{"query": "query { queryHEmp { hname } }"}""")
      assert(m.readTree(g).get("data").get("queryHEmp").size == 2)
    } finally ep.stop()
  }

  test("ACL: login issues the token; reads filter, writes error with blocked list") {
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |hsal: int @index(int) .
        |""".stripMargin)
    val acl = new Acl(
      users = Map("alice" -> Acl.User("alice",
        Acl.hashPassword("alice", "pw"), Set("dev"))),
      groups = Map("dev" -> Seq(Acl.Rule("hname", Acl.Read | Acl.Write))),
      secret = "s3cret")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""",
        """<0x1> <hsal> "100" .""",
        """<0x1> <dgraph.type> "HEmp" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      // no token: error envelope
      assert(call(port, "/query", body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql").contains("no accessJwt"))
      val tok = m.readTree(call(port, "/login",
        body = """{"userid":"alice","password":"pw"}"""))
        .get("data").get("accessJWT").asText
      // readable predicate resolves; unreadable resolves EMPTY (silent)
      val r = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname hsal } }",
        contentType = "application/dql", token = Some(tok)))
        .get("data").get("q")
      assert(r.size == 1 && r.get(0).get("hname").asText == "ann" &&
        !r.get(0).has("hsal"))
      // write to a granted predicate lands; blocked predicate errors
      call(port, "/mutate", contentType = "application/rdf",
        token = Some(tok), body = """{ set { <0x1> <hname> "ann2" . } }""")
      val denied = call(port, "/mutate", contentType = "application/rdf",
        token = Some(tok), body = """{ set { <0x1> <hsal> "9" . } }""")
      assert(denied.contains("unauthorized to mutate following predicates: hsal"))
    } finally ep.stop()
  }

  test("JSON export keeps @lang tags in the key (worker/export.go:180)") {
    val (preds, types) = SchemaRegistry.parseAlter("tname: string @lang .")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <tname> "hello"@en .""",
        """<0x1> <tname> "hallo"@de .""",
        """<0x2> <tname> "plain" .""").toDF("line")))
    val port = ep.start()
    val dest = java.nio.file.Files.createTempDirectory("graft_export_lang")
      .toString
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val er = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""mutation { export(input: {format: "json", destination: "$dest"})
             | { response { code } } }""".stripMargin))))
      assert(er.at("/data/export/response/code").asText == "Success", er)
      val lines = spark.read.text(s"$dest/g01.json").collect()
        .map(_.getString(0)).mkString("\n")
      // the tag rides in the key — a round-trip must not lose it
      assert(lines.contains(""""tname@en":"hello""""), lines)
      assert(lines.contains(""""tname@de":"hallo""""), lines)
      assert(lines.contains(""""tname":"plain""""), lines)
    } finally ep.stop()
  }

  test("/admin export and backup mutations round-trip through the real operators") {
    val ep = endpoint()
    val port = ep.start()
    val base = java.nio.file.Files.createTempDirectory("graft_admin_ops")
      .toString
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      // ---- export (reference graphql/admin/export.go) ----
      val exDest = s"$base/export"
      val er = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""mutation { export(input: {format: "rdf", destination: "$exDest"})
             | { response { code message } exportedFiles } }""".stripMargin))))
      assert(er.at("/data/export/response/code").asText == "Success", er)
      val files = er.at("/data/export/exportedFiles")
      assert(files.size == 2, er)
      // the exported N-Quads parse back to the full store: 6 attr
      // triples + dgraph.type lines from endpoint()'s fixture
      val lines = spark.read.text(s"$exDest/g01.rdf")
      val parsed = graft.sources.RdfSource.parse(
        lines.selectExpr("value as line"))
      assert(parsed.count == 6, parsed.collect.mkString("\n"))
      assert(parsed.filter("predicate = 'hname' and value = 'ann'").count == 1)
      val schemaTxt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(exDest, "g01.schema")), UTF_8)
      assert(schemaTxt.contains("<hname>: string @index(exact) ."), schemaTxt)
      // invalid format is rejected like the reference
      assert(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""mutation { export(input: {format: "csv", destination: "$exDest"}) { response { code } } }""")))
        .contains("invalid export format"))
      // ---- backup (reference graphql/admin/backup.go) ----
      val bkDest = s"$base/backup"
      val br = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""mutation { backup(input: {destination: "$bkDest"}) { response { code message } taskId } }"""))))
      assert(br.at("/data/backup/response/code").asText == "Success", br)
      assert(br.at("/data/backup/taskId").asText.startsWith("0x"), br)
      val restored = graft.operators.Backup.restore(spark, bkDest, Map.empty)
      assert(restored.attr("hname").count == 2)
      // listBackups sees the full backup (reference admin listBackups)
      val lb = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""query { listBackups(input: {location: "$bkDest"}) { type backupNum } }"""))))
      assert(lb.at("/data/listBackups/0/type").asText == "full", lb)
      // ---- restore (reference graphql/admin/restore.go): mutate the
      // live store past the backup, then restore rolls it back ----
      call(port, "/mutate", contentType = "application/rdf",
        body = """{ set { <0x1> <hname> "mutated-after-backup" . } }""")
      def ann(): String = {
        val r = m.readTree(call(port, "/query",
          body = "{ q(func: uid(0x1)) { hname } }",
          contentType = "application/dql"))
        r.at("/data/q/0/hname").asText
      }
      assert(ann() == "mutated-after-backup")
      val rr = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          s"""mutation { restore(input: {location: "$bkDest"}) { code message restoreId } }"""))))
      assert(rr.at("/data/restore/code").asText == "Success", rr)
      assert(ann() == "ann", "restore must roll the live frame back")
    } finally {
      ep.stop()
    }
  }

  test("/admin ACL CRUD: users and groups administered at runtime gate real reads") {
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |hsal: int @index(int) .
        |""".stripMargin)
    val acl = new Acl(
      users = Map("groot" -> Acl.User("groot",
        Acl.hashPassword("groot", "password"), Set("guardians"))),
      groups = Map.empty,
      secret = "s3cret-acl-admin")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""",
        """<0x1> <hsal> "100" .""",
        """<0x1> <dgraph.type> "HEmp" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def admin(doc: String, tok: Option[String]): com.fasterxml.jackson.databind.JsonNode =
        m.readTree(call(port, "/admin", token = tok,
          body = m.writeValueAsString(java.util.Map.of("query", doc))))
      def login(u: String, p: String): String =
        m.readTree(call(port, "/login",
          body = s"""{"userid":"$u","password":"$p"}"""))
          .get("data").get("accessJWT").asText
      val groot = Some(login("groot", "password"))
      // non-guardian may not administer ACL
      assert(admin("""mutation { addGroup(input: [{name: "dev"}]) { group { name } } }""",
        None).at("/errors/0/message").asText.nonEmpty)
      // guardian: group with a read rule on hname, then a user in it
      assert(admin(
        """mutation { addGroup(input: [{name: "dev", rules: [{predicate: "hname", permission: 4}]}]) { group { name } } }""",
        groot).at("/data/addGroup/group/0/name").asText == "dev")
      assert(admin(
        """mutation { addUser(input: [{name: "carol", password: "cpw", groups: [{name: "dev"}]}]) { user { name } } }""",
        groot).at("/data/addUser/user/0/name").asText == "carol")
      // duplicate user errors like the reference
      assert(admin(
        """mutation { addUser(input: [{name: "carol", password: "x"}]) { user { name } } }""",
        groot).at("/errors/0/message").asText.contains("already exists"))
      // the new user logs in and the new group's rules gate reads:
      // hname resolves, hsal (no rule) resolves EMPTY
      val carol = Some(login("carol", "cpw"))
      val q1 = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname hsal } }",
        contentType = "application/dql", token = carol)).at("/data/q")
      assert(q1.size == 1 && q1.get(0).get("hname").asText == "ann"
        && !q1.get(0).has("hsal"), q1)
      // updateGroup grants hsal read; the same query now shows it
      assert(admin(
        """mutation { updateGroup(input: {filter: {name: {eq: "dev"}}, set: {rules: [{predicate: "hsal", permission: 4}]}}) { group { name rules { predicate permission } } } }""",
        groot).at("/data/updateGroup/group/0/rules").size == 2)
      val q2 = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname hsal } }",
        contentType = "application/dql", token = carol)).at("/data/q")
      assert(q2.get(0).get("hsal").asLong == 100L, q2)
      // queryUser / getUser / queryGroup shapes
      val qu = admin("query { queryUser { name groups { name } } }", groot)
        .at("/data/queryUser")
      assert(qu.size == 2, qu) // carol + groot
      assert(admin("""query { getUser(name: "carol") { name groups { name } } }""",
        groot).at("/data/getUser/groups/0/name").asText == "dev")
      assert(admin("query { queryGroup { name rules { predicate permission } } }",
        groot).at("/data/queryGroup/0/name").asText == "dev")
      // updateUser: move carol out of dev — reads fall back to empty
      admin("""mutation { updateUser(input: {filter: {name: {eq: "carol"}}, remove: {groups: [{name: "dev"}]}}) { user { name } } }""",
        groot)
      val carol2 = Some(login("carol", "cpw"))
      val q3 = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql", token = carol2)).at("/data/q")
      assert(q3 == null || q3.size == 0, q3)
      // deleteUser: carol can no longer log in
      assert(admin("""mutation { deleteUser(filter: {name: {eq: "carol"}}) { msg numUids } }""",
        groot).at("/data/deleteUser/numUids").asInt == 1)
      assert(call(port, "/login",
        body = """{"userid":"carol","password":"cpw"}""")
        .contains("invalid user or password"))
      // deleteGroup detaches it everywhere
      assert(admin("""mutation { deleteGroup(filter: {name: {eq: "dev"}}) { msg numUids } }""",
        groot).at("/data/deleteGroup/numUids").asInt == 1)
      assert(admin("query { queryGroup { name } }", groot)
        .at("/data/queryGroup").size == 0)
      // admin-lockout guards: the guardians group can't be deleted, and
      // the LAST guardian can't be removed or deleted — either would
      // make /admin permanently unrepairable
      assert(admin("""mutation { deleteGroup(filter: {name: {eq: "guardians"}}) { msg } }""",
        groot).at("/errors/0/message").asText.contains("guardians"))
      assert(admin("""mutation { deleteUser(filter: {name: {eq: "groot"}}) { msg } }""",
        groot).at("/errors/0/message").asText.contains("last guardian"))
      assert(admin("""mutation { updateUser(input: {filter: {name: {eq: "groot"}}, remove: {groups: [{name: "guardians"}]}}) { user { name } } }""",
        groot).at("/errors/0/message").asText.contains("last guardian"))
      // with a SECOND guardian present, removing the first is legal
      admin("""mutation { addUser(input: [{name: "gee", password: "gp", groups: [{name: "guardians"}]}]) { user { name } } }""",
        groot)
      assert(admin("""mutation { deleteUser(filter: {name: {eq: "groot"}}) { msg numUids } }""",
        groot).at("/data/deleteUser/numUids").asInt == 1)
    } finally ep.stop()
  }

  test("/admin shutdown stops the server (and registered fronts) after responding") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val hookRan = new java.util.concurrent.atomic.AtomicBoolean(false)
      ep.onShutdown(() => hookRan.set(true))
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val r = m.readTree(call(port, "/admin", body = m.writeValueAsString(
        java.util.Map.of("query",
          "mutation { shutdown { response { code message } } }"))))
      assert(r.at("/data/shutdown/response/message").asText
        .contains("shutting down"), r)
      // the port closes shortly after the response ships, and the
      // registered secondary-front hook ran (the gRPC endpoint
      // registers itself the same way at start())
      val deadline = System.currentTimeMillis + 10000
      var closed = false
      while (!closed && System.currentTimeMillis < deadline) {
        try { call(port, "/health", method = "GET"); Thread.sleep(50) }
        catch { case _: java.io.IOException => closed = true }
      }
      assert(closed, "server did not stop after shutdown mutation")
      assert(hookRan.get, "secondary-front shutdown hook did not run")
    } finally ep.stop()
  }

  test("/state reports the single-group membership with schema tablets") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val st = m.readTree(call(port, "/state", method = "GET"))
      assert(st.at("/groups/1/members/1/leader").asBoolean)
      assert(st.at("/groups/1/tablets/hname/groupId").asInt == 1)
      assert(st.at("/groups/1/tablets/hsal/predicate").asText == "hsal")
      assert(st.at("/cid").asText == "graft-spark")
    } finally ep.stop()
  }

  test("/admin draining mutation refuses client requests until disabled") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def drain(on: Boolean): String = call(port, "/admin",
        body = m.writeValueAsString(java.util.Map.of("query",
          s"mutation { draining(enable: $on) { response { code message } } }")))
      assert(m.readTree(drain(true)).at("/data/draining/response/message")
        .asText.contains("set to true"))
      // client surfaces refuse with the reference error...
      val refused = call(port, "/query",
        body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql")
      assert(refused.contains("draining mode"), refused)
      assert(call(port, "/mutate", contentType = "application/rdf",
        body = """{ set { <0x7> <hname> "x" . } }""").contains("draining mode"))
      // ...but /health and /admin stay served so an operator can exit
      assert(call(port, "/health", method = "GET").contains("healthy"))
      assert(m.readTree(drain(false)).at("/data/draining/response/message")
        .asText.contains("set to false"))
      assert(!call(port, "/query", body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql").contains("draining"))
    } finally ep.stop()
  }

  test("txn handles are owner-bound, unissued startTs rejected, idle txns expire") {
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |hsal: int @index(int) .
        |""".stripMargin)
    val acl = new Acl(
      users = Map(
        "alice" -> Acl.User("alice", Acl.hashPassword("alice", "pw"), Set("dev")),
        "mallory" -> Acl.User("mallory", Acl.hashPassword("mallory", "mw"), Set("dev"))),
      groups = Map("dev" -> Seq(Acl.Rule("hname", Acl.Read | Acl.Write))),
      secret = "s3cret")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""",
        """<0x1> <dgraph.type> "HEmp" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def login(u: String, p: String): String =
        m.readTree(call(port, "/login",
          body = s"""{"userid":"$u","password":"$p"}"""))
          .get("data").get("accessJWT").asText
      val alice = login("alice", "pw")
      val mallory = login("mallory", "mw")
      // a client may not pre-claim an unissued startTs
      assert(call(port, "/mutate?commitNow=false&startTs=777",
        contentType = "application/rdf", token = Some(alice),
        body = """{ set { <0x7> <hname> "eve" . } }""").contains("not found"))
      // alice opens a txn; mallory can't append to it, commit it, or abort it
      val r1 = m.readTree(call(port, "/mutate?commitNow=false",
        contentType = "application/rdf", token = Some(alice),
        body = """{ set { <0x7> <hname> "eve" . } }"""))
      val ts = r1.get("extensions").get("txn").get("start_ts").asLong
      assert(call(port, s"/mutate?commitNow=false&startTs=$ts",
        contentType = "application/rdf", token = Some(mallory),
        body = """{ set { <0x8> <hname> "mal" . } }""").contains("aborted"))
      assert(call(port, s"/commit?startTs=$ts", token = Some(mallory))
        .contains("aborted"))
      assert(call(port, s"/commit?startTs=$ts&abort=true",
        token = Some(mallory)).contains("aborted"))
      // the txn survived the hijack attempts: alice commits it
      val c = m.readTree(call(port, s"/commit?startTs=$ts",
        token = Some(alice)))
      assert(c.get("extensions").get("txn").get("commit_ts").asLong == ts + 1)
      // ownership is bound to the IDENTITY, not the token bytes: dgo
      // auto-refreshes the access JWT mid-txn on expiry, so a txn opened
      // under alice's first token must commit under her refreshed one
      val tsR = m.readTree(call(port, "/mutate?commitNow=false",
        contentType = "application/rdf", token = Some(alice),
        body = """{ set { <0x8> <hname> "ed" . } }"""))
        .get("extensions").get("txn").get("start_ts").asLong
      // simulate the refresh: a second valid token for the same identity
      // differing by an exp claim (what a real refreshed JWT differs by)
      val aliceRefreshed = {
        def b64(x: Array[Byte]) = java.util.Base64.getUrlEncoder
          .withoutPadding.encodeToString(x)
        val h = b64("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
        val p = b64(("""{"userid":"alice","groups":["dev"],""" +
          """"namespace":0,"exp":9999999999}""").getBytes("UTF-8"))
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          "s3cret".getBytes("UTF-8"), "HmacSHA256"))
        s"$h.$p." + b64(mac.doFinal(s"$h.$p".getBytes("UTF-8")))
      }
      assert(aliceRefreshed != alice, "refreshed token must differ")
      val cR = m.readTree(call(port, s"/commit?startTs=$tsR",
        token = Some(aliceRefreshed)))
      assert(cR.get("extensions").get("txn").get("commit_ts").asLong == tsR + 1,
        cR.toString)
      // idle txns expire — an abandoned handle is gone after the deadline
      val r2 = m.readTree(call(port, "/mutate?commitNow=false",
        contentType = "application/rdf", token = Some(alice),
        body = """{ set { <0x9> <hname> "gus" . } }"""))
      val ts2 = r2.get("extensions").get("txn").get("start_ts").asLong
      ep.txnMaxIdleMs = 1L
      Thread.sleep(50)
      assert(call(port, s"/commit?startTs=$ts2", token = Some(alice))
        .contains("not found"))
    } finally ep.stop()
  }

  test("racing commits of one txn apply its batches exactly once") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def n(): Int = {
        val q = m.readTree(call(port, "/query",
          body = """{ q(func: eq(hname, "race")) { hname } }""",
          contentType = "application/dql")).get("data").get("q")
        if (q == null) 0 else q.size
      }
      (0 until 5).foreach { i =>
        val r = m.readTree(call(port, "/mutate?commitNow=false",
          contentType = "application/rdf",
          body = s"""{ set { <0x${40 + i}> <hname> "race" . } }"""))
        val ts = r.get("extensions").get("txn").get("start_ts").asLong
        // two threads commit the same ts concurrently: the conditional
        // remove guarantees exactly ONE applies (the loser errors) —
        // the old get-then-remove let both through, duplicating triples
        import java.util.concurrent.{CountDownLatch, Executors}
        val pool = Executors.newFixedThreadPool(2)
        val gate = new CountDownLatch(1)
        val results = (0 until 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[String] {
            def call(): String = {
              gate.await()
              HttpEndpointSpec.this.call(port, s"/commit?startTs=$ts")
            }
          })
        }
        gate.countDown()
        val bodies = results.map(_.get())
        pool.shutdown()
        val ok = bodies.count(_.contains("\"code\":\"Success\""))
        assert(ok == 1, s"exactly one commit must win: $bodies")
        assert(n() == i + 1, s"batch applied ${n()} times after round $i")
      }
    } finally ep.stop()
  }

  test("txn envelope: commitNow=false queues, /commit applies, abort discards") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def n(): Int = {
        val q = m.readTree(call(port, "/query",
          body = "{ q(func: has(hname)) { hname } }",
          contentType = "application/dql")).get("data").get("q")
        if (q == null) 0 else q.size
      }
      assert(n() == 2)
      val r1 = m.readTree(call(port, "/mutate?commitNow=false",
        contentType = "application/rdf",
        body = """{ set { <0x7> <hname> "eve" . } }"""))
      val ts = r1.get("extensions").get("txn").get("start_ts").asLong
      assert(n() == 2) // queued, not visible before /commit
      // a second batch appended under the same startTs
      call(port, s"/mutate?commitNow=false&startTs=$ts",
        contentType = "application/rdf",
        body = """{ set { <0x8> <hname> "fin" . } }""")
      assert(n() == 2)
      val c = m.readTree(call(port, s"/commit?startTs=$ts"))
      assert(c.get("extensions").get("txn").get("commit_ts").asLong == ts + 1)
      assert(n() == 4)
      // double-commit / unknown txn errors
      assert(call(port, s"/commit?startTs=$ts").contains("not found"))
      assert(call(port, "/commit").contains("startTs parameter is mandatory"))
      // abort discards the queued batch
      val r2 = m.readTree(call(port, "/mutate?commitNow=false",
        contentType = "application/rdf",
        body = """{ set { <0x9> <hname> "gus" . } }"""))
      val ts2 = r2.get("extensions").get("txn").get("start_ts").asLong
      assert(call(port, s"/commit?startTs=$ts2&abort=true").contains("aborted"))
      assert(call(port, s"/commit?startTs=$ts2").contains("not found"))
      assert(n() == 4)
    } finally ep.stop()
  }

  test("admin surface is guardian-gated when ACL is enabled") {
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |""".stripMargin)
    val acl = new Acl(
      users = Map(
        "alice" -> Acl.User("alice", Acl.hashPassword("alice", "pw"), Set("dev")),
        "root" -> Acl.User("root", Acl.hashPassword("root", "rpw"),
          Set(Acl.Guardians))),
      groups = Map("dev" -> Seq(Acl.Rule("hname", Acl.Read | Acl.Write))),
      secret = "s3cret")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def login(u: String, p: String): String =
        m.readTree(call(port, "/login",
          body = s"""{"userid":"$u","password":"$p"}"""))
          .get("data").get("accessJWT").asText
      val aliceTok = login("alice", "pw")
      val rootTok = login("root", "rpw")
      // /alter: no token → error; non-guardian → guardian error; guardian OK
      assert(call(port, "/alter", contentType = "application/dql",
        body = "hnick: string .").contains("no accessJwt"))
      assert(call(port, "/alter", contentType = "application/dql",
        token = Some(aliceTok), body = "hnick: string .")
        .contains("guardians"))
      assert(call(port, "/alter", contentType = "application/dql",
        token = Some(rootTok), body = "hnick: string .")
        .contains("Success"))
      // drop_all through /alter is gated the same way
      assert(call(port, "/alter", token = Some(aliceTok),
        body = """{"drop_all": true}""").contains("guardians"))
      // /admin/schema + /admin updateGQLSchema gated; getGQLSchema open
      val sdl = "type HEmp { id: ID! hname: String }"
      assert(call(port, "/admin/schema", token = Some(aliceTok), body = sdl)
        .contains("guardians"))
      assert(call(port, "/admin/schema", token = Some(rootTok), body = sdl)
        .contains("Success"))
      assert(call(port, "/admin", token = Some(aliceTok), body =
        s"""{"query":"mutation { updateGQLSchema(input: { set: { schema: \\"$sdl\\" } }) { gqlSchema { id } } }"}""")
        .contains("guardians"))
    } finally ep.stop()
  }

  test("JSON mutation: value escaping round-trips, precise delete semantics") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def hnameOf(uid: String): Option[String] = {
        val q = m.readTree(call(port, "/query",
          body = s"{ q(func: uid($uid)) { hname } }",
          contentType = "application/dql")).get("data").get("q")
        if (q == null || q.size == 0 || !q.get(0).has("hname")) None
        else Some(q.get(0).get("hname").asText)
      }
      // a value containing '"' and '\' must round-trip, not null-parse
      call(port, "/mutate", body =
        """{"set": [{"uid": "0x5", "hname": "q\"b\\s", "dgraph.type": "HEmp"}]}""")
      assert(hnameOf("0x5").contains("q\"b\\s"))
      // a predicate key with N-Quad structure chars errors, not desyncs
      assert(call(port, "/mutate", body =
        """{"set": [{"uid": "0x5", "a> <b": "x"}]}""")
        .contains("invalid predicate name"))
      // value-specific delete: non-matching value leaves the triple
      call(port, "/mutate", body =
        """{"delete": [{"uid": "0x1", "hname": "wrong"}]}""")
      assert(hnameOf("0x1").contains("ann"))
      call(port, "/mutate", body =
        """{"delete": [{"uid": "0x1", "hname": "ann"}]}""")
      assert(hnameOf("0x1").isEmpty)
      // null-valued field deletes every value of the predicate (S P *)
      call(port, "/mutate", body =
        """{"delete": [{"uid": "0x2", "hname": null}]}""")
      assert(hnameOf("0x2").isEmpty)
      // uid-only delete object drops the whole node (S * *)
      val before = m.readTree(call(port, "/query",
        body = "{ q(func: uid(0x2)) { hsal } }",
        contentType = "application/dql")).get("data").get("q")
      assert(before.size == 1)
      call(port, "/mutate", body = """{"delete": [{"uid": "0x2"}]}""")
      val after = m.readTree(call(port, "/query",
        body = "{ q(func: uid(0x2)) { hsal } }",
        contentType = "application/dql")).get("data").get("q")
      assert(after == null || after.size == 0 || !after.get(0).has("hsal"))
    } finally ep.stop()
  }

  test("RDF mutation: '}' inside a value doesn't truncate the block; bad lines rejected") {
    val ep = endpoint()
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      call(port, "/mutate", contentType = "application/rdf", body =
        """{ set {
          |  <0x5> <hname> "curly } brace" .
          |  <0x6> <hname> "after" .
          |} }""".stripMargin)
      val q = m.readTree(call(port, "/query",
        body = "{ q(func: has(hname)) { hname } }",
        contentType = "application/dql")).get("data").get("q")
      val names = (0 until q.size).map(q.get(_).get("hname").asText).toSet
      // BOTH lines landed — the line after the brace-bearing value too
      assert(names.contains("curly } brace") && names.contains("after"))
      // a malformed line errors at the door instead of null-parsing
      assert(call(port, "/mutate", contentType = "application/rdf",
        body = """{ set { <0x7> hname "oops" . } }""")
        .contains("invalid N-Quad"))
      assert(call(port, "/mutate", contentType = "application/rdf",
        body = """{ delete { oops } }""").contains("invalid N-Quad"))
    } finally ep.stop()
  }

  test("/graphql reads the JWT from the Dgraph.Authorization header for @auth") {
    val (preds, types) = SchemaRegistry.parseAlter(
      "hname: string @index(exact) .\n")
    val sdl = SdlParser.parse(
      """type HEmp @auth(
        |    query: { rule: "{$ROLE: { eq: \"admin\" } }"}
        |){
        |  id: ID!
        |  hname: String @search(by: [exact])
        |}
        |# Dgraph.Authorization {"VerificationKey":"topsecret","Header":"X-Auth","Namespace":"","Algo":"HS256"}
        |""".stripMargin)
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "ann" .""",
        """<0x1> <dgraph.type> "HEmp" .""").toDF("line")),
      sdl)
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def b64(x: Array[Byte]) = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(x)
      def hs256(payload: String, secret: String): String = {
        val h = b64("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
        val p = b64(payload.getBytes("UTF-8"))
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          secret.getBytes("UTF-8"), "HmacSHA256"))
        s"$h.$p." + b64(mac.doFinal(s"$h.$p".getBytes("UTF-8")))
      }
      val body = """{"query": "query { queryHEmp { hname } }"}"""
      // anonymous: @auth fails closed → empty
      val anon = m.readTree(call(port, "/graphql", body = body))
        .get("data").get("queryHEmp")
      assert(anon == null || anon.size == 0)
      // admin JWT in the configured X-Auth header → rows
      val admin = m.readTree(call(port, "/graphql", body = body,
        headers = Map("X-Auth" -> hs256("""{"ROLE":"admin"}""", "topsecret"))))
        .get("data").get("queryHEmp")
      assert(admin.size == 1 && admin.get(0).get("hname").asText == "ann")
      // a forged signature is an error envelope, not silent data
      assert(call(port, "/graphql", body = body,
        headers = Map("X-Auth" -> hs256("""{"ROLE":"admin"}""", "forged")))
        .contains("errors"))
    } finally ep.stop()
  }

  test("/debug/prometheus_metrics: exposition parses and counters move") {
    val ep = endpoint()
    val port = ep.start()
    try {
      def scrape(): String = call(port, "/debug/prometheus_metrics",
        method = "GET")
      call(port, "/query", contentType = "application/dql",
        body = "{ q(func: has(hname)) { hname } }")
      call(port, "/query", contentType = "application/dql",
        body = "{ broken(") // parse error → error-outcome counter
      val text = scrape()
      // exposition format: every non-comment line is `series value`
      val lineRe =
        """^[a-zA-Z_:][a-zA-Z0-9_:]*(\{[^}]*\})? -?\d+(\.\d+)?(E-?\d+)?$""".r
      text.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#"))
        .foreach(l => assert(lineRe.matches(l), s"bad exposition line: $l"))
      assert(text.contains("# TYPE graft_http_requests_total counter"), text)
      assert(text.contains("# TYPE graft_open_txns gauge"), text)
      def count(status: String): Double =
        (s"""graft_http_requests_total\\{path="/query",status="$status"\\} (\\d+)""").r
          .findFirstMatchIn(text).map(_.group(1).toDouble).getOrElse(0.0)
      assert(count("ok") >= 1.0, text)
      assert(count("error") >= 1.0, text)
      assert(("""graft_request_seconds_total\{path="/query"\} ([\d.E-]+)""").r
        .findFirstMatchIn(text).exists(_.group(1).toDouble > 0.0), text)
      // counters are monotone across scrapes
      call(port, "/query", contentType = "application/dql",
        body = "{ q(func: has(hname)) { hname } }")
      val text2 = scrape()
      def countIn(t: String): Double =
        ("""graft_http_requests_total\{path="/query",status="ok"\} (\d+)""").r
          .findFirstMatchIn(t).map(_.group(1).toDouble).getOrElse(0.0)
      assert(countIn(text2) > countIn(text), s"${countIn(text)} -> ${countIn(text2)}")
    } finally ep.stop()
  }

  test("namespace lifecycle: add, load, isolated query, resetPassword, delete") {
    val (preds, types) = SchemaRegistry.parseAlter("hname: string @index(exact) .")
    val acl = new Acl(
      users = Map("groot" -> Acl.User("groot",
        Acl.hashPassword("groot", "password"), Set(Acl.Guardians))),
      groups = Map.empty, secret = "galaxy-secret")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq("""<0x1> <hname> "galaxy-ann" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def login(body: String): String =
        m.readTree(call(port, "/login", body = body))
          .get("data").get("accessJWT").asText
      val galaxy = login("""{"userid":"groot","password":"password"}""")
      def admin(q: String, tok: String): com.fasterxml.jackson.databind.JsonNode =
        m.readTree(call(port, "/admin", token = Some(tok),
          body = m.writeValueAsString(java.util.Map.of("query", q))))
      // ---- add (graphql/admin/namespace.go:29) ----
      val add = admin(
        """mutation { addNamespace(input: {password: "tenant-pw"})
          | { namespaceId message } }""".stripMargin, galaxy)
      val ns = add.at("/data/addNamespace/namespaceId").asLong
      assert(ns > 0L, add.toString)
      // the tenant's groot logs into ITS namespace
      val tenant = login(
        s"""{"userid":"groot","password":"tenant-pw","namespace":$ns}""")
      // ---- load into it; galaxy data is invisible, tenant data is ----
      call(port, "/mutate", contentType = "application/rdf",
        token = Some(tenant),
        body = """{ set { <0x9> <hname> "tenant-bob" . } }""")
      val tq = call(port, "/query", contentType = "application/dql",
        token = Some(tenant), body = "{ q(func: has(hname)) { hname } }")
      assert(tq.contains("tenant-bob") && !tq.contains("galaxy-ann"), tq)
      val gq = call(port, "/query", contentType = "application/dql",
        token = Some(galaxy), body = "{ q(func: has(hname)) { hname } }")
      assert(gq.contains("galaxy-ann") && !gq.contains("tenant-bob"), gq)
      // a tenant guardian may NOT administer the galaxy
      assert(admin("""mutation { addNamespace(input: {password: "x"})
        | { namespaceId } }""".stripMargin, tenant).toString
        .contains("guardian of galaxy"))
      // ---- resetPassword (graphql/admin/reset_password.go:20) ----
      val rp = admin(
        s"""mutation { resetPassword(input:
           | {userId: "groot", password: "rotated", namespace: $ns})
           | { userId message } }""".stripMargin, galaxy)
      assert(rp.at("/data/resetPassword/message").asText
        .contains("successful"), rp.toString)
      assert(call(port, "/login", body =
        s"""{"userid":"groot","password":"tenant-pw","namespace":$ns}""")
        .contains("invalid user or password"))
      val tenant2 = login(
        s"""{"userid":"groot","password":"rotated","namespace":$ns}""")
      // ---- delete; the tenant is gone, the galaxy untouched ----
      val del = admin(
        s"""mutation { deleteNamespace(input: {namespaceId: $ns})
           | { namespaceId message } }""".stripMargin, galaxy)
      assert(del.at("/data/deleteNamespace/message").asText
        .contains("Deleted"), del.toString)
      assert(call(port, "/query", contentType = "application/dql",
        token = Some(tenant2), body = "{ q(func: has(hname)) { hname } }")
        .contains("does not exist"))
      assert(call(port, "/login", body =
        s"""{"userid":"groot","password":"rotated","namespace":$ns}""")
        .contains("invalid user or password"))
      assert(call(port, "/query", contentType = "application/dql",
        token = Some(galaxy), body = "{ q(func: has(hname)) { hname } }")
        .contains("galaxy-ann"))
      // default namespace is undeletable
      assert(admin("""mutation { deleteNamespace(input: {namespaceId: 0})
        | { namespaceId } }""".stripMargin, galaxy).toString
        .contains("Cannot delete default namespace"))
    } finally ep.stop()
  }

  test("tenant guardians cannot escalate: galaxy-only ops, ns-scoped ACL CRUD") {
    val (preds, types) = SchemaRegistry.parseAlter("hname: string @index(exact) .")
    val acl = new Acl(
      users = Map("groot" -> Acl.User("groot",
        Acl.hashPassword("groot", "password"), Set(Acl.Guardians))),
      groups = Map.empty, secret = "galaxy-secret")
    val ep = new HttpEndpoint(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq("""<0x1> <hname> "galaxy-ann" .""").toDF("line")),
      acl = Some(acl))
    val port = ep.start()
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def login(body: String): String =
        m.readTree(call(port, "/login", body = body))
          .get("data").get("accessJWT").asText
      val galaxy = login("""{"userid":"groot","password":"password"}""")
      def admin(q: String, tok: String): String =
        call(port, "/admin", token = Some(tok),
          body = m.writeValueAsString(java.util.Map.of("query", q)))
      val ns = m.readTree(admin(
        """mutation { addNamespace(input: {password: "tenant-pw"})
          | { namespaceId } }""".stripMargin, galaxy))
        .at("/data/addNamespace/namespaceId").asLong
      val tenant = login(
        s"""{"userid":"groot","password":"tenant-pw","namespace":$ns}""")
      // every whole-store admin op rejects a tenant guardian (reference
      // edgraph/server.go "Only guardian of galaxy")
      for (q <- Seq(
        """mutation { export(input: {destination: "/tmp/x"}) { response { code } } }""",
        """mutation { backup(input: {destination: "/tmp/x"}) { taskId } }""",
        """mutation { restore(input: {location: "/tmp/x"}) { code } }""",
        """mutation { draining(enable: true) { response { code } } }""",
        """mutation { shutdown { response { code } } }""",
        """query { listBackups(input: {location: "/tmp/x"}) { backupNum } }"""))
        assert(admin(q, tenant).contains("guardian of galaxy"), q)
      // EVERY drop form through /alter is galaxy-only (each mutates the
      // shared ns-0 frame or schema); plain schema alters aren't
      for (drop <- Seq("""{"drop_all": true}""", """{"drop_attr": "hname"}""",
        """{"drop_op": "TYPE", "drop_value": "T"}""",
        """{"drop_op": "DATA"}"""))
        assert(call(port, "/alter", token = Some(tenant), body = drop)
          .contains("guardian of galaxy"), drop)
      assert(call(port, "/alter", token = Some(tenant),
        body = "tname: string .").contains("Success"))
      // the galaxy groot's own data survived the rejected drops
      assert(call(port, "/query", contentType = "application/dql",
        token = Some(galaxy), body = "{ q(func: has(hname)) { hname } }")
        .contains("galaxy-ann"))
      // ACL CRUD is scoped to the CALLER's namespace: the tenant groot
      // resetting "groot"'s password touches ITS groot, not the galaxy's
      assert(admin("""mutation { updateUser(input: {filter: {name: {eq:
        | "groot"}}, set: {password: "stolen"}}) { user { name } } }"""
        .stripMargin, tenant).contains("updateUser"))
      // galaxy groot's password is unchanged; the tenant's was rotated
      login("""{"userid":"groot","password":"password"}""")
      assert(call(port, "/login", body =
        """{"userid":"groot","password":"stolen"}""")
        .contains("invalid user or password"))
      login(s"""{"userid":"groot","password":"stolen","namespace":$ns}""")
      // tenant user/group listings stay inside the tenant
      assert(admin("""mutation { addGroup(input: [{name: "eng"}])
        | { group { name } } }""".stripMargin, tenant).contains("eng"))
      assert(!admin("query { queryGroup { name rules { predicate } } }",
        galaxy).contains("eng"))
      assert(!admin("query { queryUser { name } }", tenant)
        .toLowerCase.contains("galaxy"))
      // a tenant guardian may not delete the galaxy groot either
      admin("""mutation { deleteUser(filter: {name: {eq: "groot"}})
        | { numUids } }""".stripMargin, tenant)
      login("""{"userid":"groot","password":"password"}""")
      // metrics label cardinality is bounded by the ROUTE TABLE: a
      // unique /health suffix must not mint a new label value
      call(port, "/health/zzz-unique-suffix", method = "GET")
      val text = call(port, "/debug/prometheus_metrics", method = "GET")
      assert(!text.contains("zzz-unique-suffix"), text)
      assert(text.contains("""path="/health""""), text)
    } finally ep.stop()
  }
}
