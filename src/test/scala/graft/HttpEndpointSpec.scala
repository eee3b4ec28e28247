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
      token: Option[String] = None): String = {
    val c = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setRequestProperty("Content-Type", contentType)
    token.foreach(c.setRequestProperty("X-Dgraph-AccessToken", _))
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
}
