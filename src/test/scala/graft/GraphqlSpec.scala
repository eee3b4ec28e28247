package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TripleStore, Uids}
import graft.dql._
import graft.graphql._

/** GraphQL front-end specs: document parsing, SDL parsing, and the
  * rewrite shapes the reference pins in
  * graphql/resolve/query_test.yaml (root promotion, get-by-id,
  * aggregate two-block form, filter and/or/not combination).
  */
class GraphqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val sf = "/root/testdata/sf0.001"
  lazy val engine = new GraphQLEngine(TripleStore(spark, sf))

  private def rewrite(q: String): DqlQuery =
    Rewriter.rewrite(GqlParser.parse(q), SdlParser.tpch)

  test("document parser: aliases, args, list/object values, directives") {
    val op = GqlParser.parse(
      """query {
        |  people: queryCustomer(filter: { or: [ { name: { eq: "x" } },
        |      { acctbal: { between: { min: 1, max: 2.5 } } } ] },
        |      first: 5) @cascade {
        |    nm: name
        |    located_in { name }
        |  }
        |}""".stripMargin)
    val r = op.roots.head
    assert(r.alias.contains("people") && r.name == "queryCustomer")
    assert(r.directives == Seq("cascade"))
    assert(r.children.map(_.outName) == Seq("nm", "located_in"))
    val GList(ors) = r.arg("filter").get.asInstanceOf[GObj].get("or").get
    assert(ors.size == 2)
  }

  test("operation variables: substitution, defaults, missing-value error") {
    val doc =
      """query Q($seg: String!, $n: Int! = 3, $tags: [String!]) {
        |  queryCustomer(filter: { mktsegment: { eq: $seg } }, first: $n) {
        |    name } }""".stripMargin
    val op = GqlParser.parse(doc, Map("seg" -> GStr("BUILDING")))
    val r = op.roots.head
    // caller value substituted; default fills the unset $n
    assert(r.arg("filter").get.asInstanceOf[GObj].get("mktsegment").get
      .asInstanceOf[GObj].get("eq").contains(GStr("BUILDING")))
    assert(r.arg("first").contains(GNum("3")))
    // caller value overrides a default
    val op2 = GqlParser.parse(doc,
      Map("seg" -> GStr("AUTOMOBILE"), "n" -> GNum("7")))
    assert(op2.roots.head.arg("first").contains(GNum("7")))
    // using an unbound variable with no default is a parse error
    val err = intercept[GqlParser.ParseException] { GqlParser.parse(doc) }
    assert(err.getMessage.contains("seg"))
  }

  test("named fragments: spreads spliced at any depth, cycles rejected") {
    val op = GqlParser.parse(
      """query {
        |  queryCustomer(first: 2) { ...core located_in { ...place } }
        |}
        |fragment core on Customer { name acctbal }
        |fragment place on Nation { name }""".stripMargin)
    val r = op.roots.head
    assert(r.children.map(_.name) == Seq("name", "acctbal", "located_in"))
    assert(r.children.last.children.map(_.name) == Seq("name"))
    val cyc = intercept[GqlParser.ParseException] {
      GqlParser.parse(
        """query { queryCustomer { ...a } }
          |fragment a on Customer { ...b }
          |fragment b on Customer { ...a }""".stripMargin)
    }
    assert(cyc.getMessage.contains("cycle"))
    val undef = intercept[GqlParser.ParseException] {
      GqlParser.parse("query { queryCustomer { ...nope } }")
    }
    assert(undef.getMessage.contains("undefined fragment"))
  }

  test("interfaces: field inheritance and implementer expansion") {
    val sch = SdlParser.parse(
      """interface Named { id: ID!  name: String @search(by: [term]) }
        |type A implements Named { extra: Int }
        |type B implements Named { name: String @search(by: [exact]) }
        |type C { name: String }""".stripMargin)
    assert(sch.typ("Named").isInterface)
    assert(sch.implementers("Named") == Seq("A", "B"))
    // A inherits id+name; B's redeclared name wins over the inherited one
    assert(sch.typ("A").field("name").exists(_.searchable == Seq("term")))
    assert(sch.typ("A").field("id").exists(_.isId))
    assert(sch.typ("B").field("name").exists(_.searchable == Seq("exact")))
    // queryParty (tpch) seeds type(Party, Customer, Supplier)
    val q = rewrite("query { queryParty { name } }")
    assert(q.blocks.head.func.name == "type")
    assert(q.blocks.head.func.args == Seq("Customer", "Supplier"))
  }

  test("SDL parser: lists, ID fields, @search tokenizers") {
    val s = SdlParser.parse(
      """type Author {
        |  id: ID!
        |  name: String! @search(by: [term, exact])
        |  posts: [Post] @hasInverse(field: author)
        |}
        |type Post { title: String @search }""".stripMargin)
    val a = s.typ("Author")
    assert(a.field("id").get.isId)
    assert(a.field("name").get.searchable == Seq("term", "exact"))
    assert(a.field("posts").get.isList && a.field("posts").get.typeName == "Post")
    assert(s.typ("Post").field("title").get.searchable == Seq("default"))
  }

  test("rewrite: eq filter promoted to root, type demoted to filter") {
    val q = rewrite(
      """{ queryCustomer(filter: { mktsegment: { eq: "BUILDING" } }) { name } }""")
    val b = q.blocks.head
    assert(b.func == FuncCall("eq", "mktsegment", Seq("BUILDING")))
    assert(b.filter.contains(FilterLeaf(FuncCall("type", "Customer", Nil))))
  }

  test("rewrite: in-list becomes multi-value eq root") {
    val q = rewrite(
      """{ queryPart(filter: { brand: { in: ["Brand#12", "Brand#13"] } }) { name } }""")
    assert(q.blocks.head.func == FuncCall("eq", "brand", Seq("Brand#12", "Brand#13")))
  }

  test("rewrite: get<T> is uid root with type filter") {
    val q = rewrite("""{ getCustomer(id: "0x2ba7def3042") { name } }""")
    val b = q.blocks.head
    assert(b.func == FuncCall("uid", "", Seq("0x2ba7def3042")))
    assert(b.filter.contains(FilterLeaf(FuncCall("type", "Customer", Nil))))
  }

  test("rewrite: sibling entries AND, or-branch ORs against them") {
    val q = rewrite(
      """{ queryOrder(filter: { orderstatus: { eq: "O" },
        |    totalprice: { gt: 1000 },
        |    or: { orderpriority: { eq: "1-URGENT" } } }) { orderstatus } }""".stripMargin)
    q.blocks.head.filter.get match {
      case FilterOr(Seq(FilterAnd(ands), FilterLeaf(orLeaf))) =>
        assert(ands.size == 2)
        assert(orLeaf == FuncCall("eq", "orderpriority", Seq("1-URGENT")))
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("rewrite: aggregate<T> yields var block + aggregation block") {
    val q = rewrite(
      """{ aggregateOrder(filter: { orderstatus: { eq: "F" } }) {
        |    count totalpriceSum totalpriceAvg } }""".stripMargin)
    assert(q.blocks.size == 2)
    val v = q.blocks.head
    assert(v.name == "var" && v.selections.head.varName.contains("ag_totalprice"))
    val a = q.blocks(1)
    assert(a.selections.map(_.aggOp) == Seq(None, Some("sum"), Some("avg")))
  }

  test("response: errors envelope on bad field / malformed document") {
    val bad = engine.response("query { queryCustomer { nosuchfield } }").collect()
    assert(bad.length == 1 && bad.head.getString(0) == "errors")
    assert(bad.head.getString(2).startsWith("""{"errors":[{"message":"""))
    val malformed = engine.response("query { queryCustomer(filter: ").collect()
    assert(malformed.head.getString(0) == "errors")
    // a good query still returns data rows
    val ok = engine.response(
      """query { queryNation(filter: { name: { eq: "NATION_3" } }) { name } }""")
      .collect()
    assert(ok.length == 1 && ok.head.getString(0) == "queryNation")
  }

  test("aliased root fields with conflicting args resolve independently") {
    val df = engine.json(
      """query {
        |  rich: queryCustomer(filter: { acctbal: { ge: 8000.0 } }) { name }
        |  poor: queryCustomer(filter: { acctbal: { le: 0.0 } }) { name }
        |}""".stripMargin)
    val byBlock = df.collect().groupBy(_.getAs[String]("block"))
    assert(byBlock.keySet == Set("rich", "poor"))
    // the two aliased roots carry different filters — no row overlap
    val rich = byBlock("rich").map(_.getAs[Long]("uid")).toSet
    val poor = byBlock("poor").map(_.getAs[Long]("uid")).toSet
    assert(rich.nonEmpty && poor.nonEmpty && rich.intersect(poor).isEmpty)
  }

  test("execution: get by id returns exactly the row") {
    val df = engine.flat(s"""{ getCustomer(id: "${Uids.Customer + 1}") { name } }""")
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("uid") == Uids.Customer + 1)
  }

  test("execution: child pagination keeps at most first-N per parent") {
    val df = engine.flat(
      """{ queryCustomer(filter: { mktsegment: { eq: "MACHINERY" } }) @cascade {
        |    placed(order: { desc: totalprice }, first: 2) { totalprice } } }""".stripMargin)
    val per = df.groupBy("uid").count().collect()
    assert(per.nonEmpty && per.forall(_.getAs[Long]("count") <= 2))
  }

  test("execution: unknown field errors clearly") {
    val e = intercept[Rewriter.RewriteException] {
      engine.flat("""{ queryCustomer { nope } }""")
    }
    assert(e.getMessage.contains("no field"))
  }

  // ---- vector surface: querySimilar<T>ByEmbedding (reference
  // query/vector/vector_graphql_test.go + graphql/resolve/
  // query_rewriter.go:800 rewriteAsSimilarByEmbeddingQuery) ----

  private lazy val vectorEngine: GraphQLEngine = {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """title: string @index(exact) .
        |title_v: float32vector @index(hnsw(metric: "euclidean", exponent: "4")) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <title> "alpha" .""",
        """<0x1> <title_v> "[1, 0, 0, 0, 0]" .""",
        """<0x1> <dgraph.type> "Project" .""",
        """<0x2> <title> "beta" .""",
        """<0x2> <title_v> "[0, 1, 0, 0, 0]" .""",
        """<0x2> <dgraph.type> "Project" .""",
        """<0x3> <title> "gamma" .""",
        """<0x3> <title_v> "[0.9, 0.1, 0, 0, 0]" .""",
        """<0x3> <dgraph.type> "Project" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Project {
        |  id: ID!
        |  title: String! @search(by: [exact])
        |  title_v: [Float!] @embedding @search(by: ["hnsw(metric: euclidean, exponent: 4)"])
        |}""".stripMargin)
    new GraphQLEngine(store, sdl)
  }

  test("querySimilarProjectByEmbedding: distance-ordered top-k with vector echo") {
    // the SDL parser keeps the quoted hnsw spec as ONE search entry
    val f = vectorEngine.rewrite(
      """query { querySimilarProjectByEmbedding(by: title_v, topK: 2,
        |  vector: [1.0, 0.0, 0.0, 0.0, 0.0]) { title } }""".stripMargin)
    assert(f.blocks.head.func.name == "similar_to")
    val rows = vectorEngine.json(
      """query { querySimilarProjectByEmbedding(by: title_v, topK: 2,
        |  vector: [1.0, 0.0, 0.0, 0.0, 0.0]) {
        |    title title_v vector_distance } }""".stripMargin)
      .collect().map(_.getAs[String]("json"))
    // alpha is the query vector itself (distance 0); gamma is nearer
    // than beta; topK=2 cuts beta
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows(0).contains("\"title\":\"alpha\"") &&
      rows(0).contains("\"vector_distance\":0.0"), rows(0))
    assert(rows(1).contains("\"title\":\"gamma\""), rows(1))
    assert(rows(1).contains("\"title_v\":[0.9,0.1,0,0,0]") ||
      rows(1).contains("\"title_v\":[0.9,0.1,0.0,0.0,0.0]"), rows(1))
  }

  test("querySimilarByEmbedding metrics: cosine ranks by angle, dotproduct by dot") {
    val sdlCos = SdlParser.parse(
      """type Project {
        |  id: ID!
        |  title: String! @search(by: [exact])
        |  title_v: [Float!] @embedding @search(by: ["hnsw(metric: cosine)"])
        |}""".stripMargin)
    val op = GqlParser.parse(
      """query { querySimilarProjectByEmbedding(by: title_v, topK: 2,
        |  vector: [1.0, 0.0]) { title } }""".stripMargin)
    val dql = Rewriter.rewrite(op, sdlCos)
    // cosine formula: 1 - dot/sqrt(|q||v|) (reference query_rewriter.go
    // distanceFormula per metric)
    val mathSel = dql.blocks.head.selections.find(_.pred == "math").get
    assert(mathSel.mathExpr.get.toString.contains("dot"))
  }

  test("querySimilarProjectById: anchor excluded, distance-ordered") {
    // reference four-block rewrite (query_rewriter.go:621): the anchor's
    // own embedding seeds the search and the anchor is filtered out
    val rows = vectorEngine.json(
      """query { querySimilarProjectById(by: title_v, topK: 3, id: "0x1") {
        |    title vector_distance } }""".stripMargin)
      .collect().map(_.getAs[String]("json"))
    assert(rows.length == 2, rows.mkString("\n"))
    assert(rows(0).contains("\"title\":\"gamma\""), rows(0))
    assert(rows(1).contains("\"title\":\"beta\""), rows(1))
  }

  // ---- @auth query rules (reference graphql/schema/auth.go +
  // graphql/resolve/auth_query_test.yaml) ----

  private lazy val authEngine: GraphQLEngine = {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """text: string @index(exact) .
        |ownedBy: string @index(exact) .
        |role: string @index(exact) .
        |secrets: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <text> "tweet one" .""",
        """<0x1> <dgraph.type> "Tweets" .""",
        """<0x2> <text> "tweet two" .""",
        """<0x2> <dgraph.type> "Tweets" .""",
        """<0x10> <text> "alice secret" .""",
        """<0x10> <ownedBy> "alice" .""",
        """<0x10> <dgraph.type> "UserSecret" .""",
        """<0x11> <text> "bob secret" .""",
        """<0x11> <ownedBy> "bob" .""",
        """<0x11> <dgraph.type> "UserSecret" .""",
        """<0x20> <ownedBy> "alice" .""",
        """<0x20> <secrets> <0x10> .""",
        """<0x20> <secrets> <0x11> .""",
        """<0x20> <dgraph.type> "Account" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Tweets @auth(
        |    query: { rule: "{$ROLE: { eq: \"admin\" } }"}
        |){
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}
        |type UserSecret @auth(
        |    query: { rule: "query($USER: String!) { queryUserSecret(filter: { ownedBy: { eq: $USER } }) { __typename } }" }
        |){
        |  id: ID!
        |  text: String! @search(by: [exact])
        |  ownedBy: String @search(by: [exact])
        |}
        |type Account {
        |  id: ID!
        |  ownedBy: String @search(by: [exact])
        |  secrets: [UserSecret]
        |}""".stripMargin)
    new GraphQLEngine(store, sdl)
  }

  test("@auth RBAC rule gates the root: admin sees rows, others none") {
    // reference auth_query_test.yaml: an RBAC-false root rewrites to an
    // emptied query
    val admin = authEngine.json("query { queryTweets { text } }",
      jwt = Map("ROLE" -> "admin"))
    assert(admin.count() == 2)
    val user = authEngine.json("query { queryTweets { text } }",
      jwt = Map("ROLE" -> "user"))
    assert(user.count() == 0)
    // a missing claim is FALSE (reference EvaluateRBACRule)
    val anon = authEngine.json("query { queryTweets { text } }")
    assert(anon.count() == 0)
  }

  test("@auth graph rule injects the owner filter from the JWT claim") {
    // reference UserSecret rule: only rows whose ownedBy equals $USER
    val alice = authEngine.json("query { queryUserSecret { text ownedBy } }",
      jwt = Map("USER" -> "alice")).collect()
    assert(alice.length == 1 && alice.head.getString(2).contains("alice secret"))
    val bob = authEngine.json("query { queryUserSecret { text } }",
      jwt = Map("USER" -> "bob"))
    assert(bob.count() == 1)
  }

  test("@auth on a nested field: denied type's field is omitted, graph rule filters") {
    // auth_query_test.yaml "Deep RBAC rule - Level 1 false": the parent
    // renders, the guarded child field disappears
    val rows = authEngine.json(
      """query { queryAccount { ownedBy secrets { text } } }""",
      jwt = Map("USER" -> "alice")).collect()
    assert(rows.length == 1)
    // graph rule filters the nested secrets to the owner's
    assert(rows.head.getString(2).contains("alice secret"))
    assert(!rows.head.getString(2).contains("bob secret"))
  }

  test("@auth composition: or-of-RBAC opens for either claim") {
    val sdl = SdlParser.parse(
      """type Doc @auth(query: { or: [
        |  { rule: "{$ROLE: { eq: \"admin\" } }"},
        |  { rule: "{$ROLE: { eq: \"auditor\" } }"} ] }
        |){
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}""".stripMargin)
    assert(sdl.typ("Doc").auth.contains("query"))
    assert(Auth.eval(sdl.typ("Doc").auth("query"),
      Map("ROLE" -> "auditor")) == Left(true))
    assert(Auth.eval(sdl.typ("Doc").auth("query"),
      Map("ROLE" -> "user")) == Left(false))
    // and: RBAC true AND graph rule -> residual filter
    val mixed = Auth.parseDirective(
      """query: { and: [
        |  { rule: "{$ROLE: { eq: \"admin\" } }"},
        |  { rule: "query($USER: String!) { queryDoc(filter: { text: { eq: $USER } }) { __typename } }" } ] }"""
        .stripMargin)
    assert(Auth.eval(mixed("query"),
      Map("ROLE" -> "admin", "USER" -> "x")).isRight)
    assert(Auth.eval(mixed("query"), Map("USER" -> "x")) == Left(false))
  }

  test("Auth.claimsFromJwt decodes an unverified payload incl. nested custom claims") {
    val payload = """{"USER":"alice","https://my.app/claims":{"ROLE":"admin"}}"""
    val b64 = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(payload.getBytes("UTF-8"))
    val claims = Auth.claimsFromJwt(s"eyJhbGciOiJIUzI1NiJ9.$b64.sig")
    assert(claims("USER") == "alice" && claims("ROLE") == "admin")
  }

  test("@auth on interfaces: rules merge into implementers, interface query verifies per-type") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |owner: string @index(exact) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <name> "pub doc" .""",
        """<0x1> <dgraph.type> "PublicDoc" .""",
        """<0x2> <name> "alice doc" .""",
        """<0x2> <owner> "alice" .""",
        """<0x2> <dgraph.type> "OwnedDoc" .""",
        """<0x3> <name> "bob doc" .""",
        """<0x3> <owner> "bob" .""",
        """<0x3> <dgraph.type> "OwnedDoc" .""",
        """<0x4> <name> "admin doc" .""",
        """<0x4> <dgraph.type> "AdminDoc" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """interface Doc {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |}
        |type PublicDoc implements Doc {
        |}
        |type OwnedDoc implements Doc @auth(
        |  query: { rule: "query($USER: String!) { queryOwnedDoc(filter: { owner: { eq: $USER } }) { __typename } }" }
        |){
        |  owner: String @search(by: [exact])
        |}
        |type AdminDoc implements Doc @auth(
        |  query: { rule: "{$ROLE: { eq: \"admin\" } }"}
        |){
        |}""".stripMargin)
    // the interface's own auth cleared; the implementer kept its rule
    assert(sdl.typ("Doc").auth.isEmpty)
    assert(sdl.typ("OwnedDoc").auth.contains("query"))
    val eng = new GraphQLEngine(store, sdl)
    // alice, not admin: public + her own doc
    val alice = eng.json("query { queryDoc { name } }",
      jwt = Map("USER" -> "alice")).collect().map(_.getString(2)).sorted
    assert(alice.length == 2)
    assert(alice.exists(_.contains("pub doc")) && alice.exists(_.contains("alice doc")))
    // admin with no USER claim: public + admin docs, no owned docs
    val admin = eng.json("query { queryDoc { name } }",
      jwt = Map("ROLE" -> "admin")).collect().map(_.getString(2)).sorted
    assert(admin.length == 2)
    assert(admin.exists(_.contains("pub doc")) && admin.exists(_.contains("admin doc")))
    // anonymous: only the public implementer
    val anon = eng.json("query { queryDoc { name } }").collect()
    assert(anon.length == 1 && anon.head.getString(2).contains("pub doc"))
    // direct query of the denied type stays empty
    assert(eng.json("query { queryAdminDoc { name } }").count() == 0)
  }

  test("@auth guards similarity roots and anonymous graph rules classify correctly") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """stext: string @index(exact) .
        |sowner: string @index(exact) .
        |semb: float32vector @index(hnsw(metric: "euclidean")) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <stext> "alice vec" .""",
        """<0x1> <sowner> "alice" .""",
        """<0x1> <semb> "[1, 0]" .""",
        """<0x1> <dgraph.type> "SecretVec" .""",
        """<0x2> <stext> "bob vec" .""",
        """<0x2> <sowner> "bob" .""",
        """<0x2> <semb> "[0.9, 0.1]" .""",
        """<0x2> <dgraph.type> "SecretVec" .""").toDF("line")))
    // ANONYMOUS graph rule (leading "{ query..." — must classify as a
    // graph rule, not an RBAC object)
    val sdl = SdlParser.parse(
      """type SecretVec @auth(
        |  query: { rule: "{ querySecretVec(filter: { sowner: { eq: $USER } }) { __typename } }" }
        |){
        |  id: ID!
        |  stext: String! @search(by: [exact])
        |  sowner: String @search(by: [exact])
        |  semb: [Float!] @embedding @search(by: ["hnsw(metric: euclidean)"])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // the similarity ROOT must enforce the same rule as query<T>
    val alice = eng.json(
      """query { querySimilarSecretVecByEmbedding(by: semb, topK: 5,
        |  vector: [1, 0]) { stext } }""".stripMargin,
      jwt = Map("USER" -> "alice")).collect()
    assert(alice.length == 1 && alice.head.getString(2).contains("alice vec"))
    // no claim: graph rule unsatisfiable -> empty, not an error
    assert(eng.json(
      """query { querySimilarSecretVecByEmbedding(by: semb, topK: 5,
        |  vector: [1, 0]) { stext } }""".stripMargin).count() == 0)
    // similar-by-id: an anchor the caller cannot read behaves missing
    assert(eng.json(
      """query { querySimilarSecretVecById(by: semb, topK: 5, id: "0x2") {
        |  stext } }""".stripMargin,
      jwt = Map("USER" -> "alice")).count() == 0)
  }

  test("@auth guards interface-typed nested edges per implementer") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |owner: string @index(exact) .
        |docs: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <name> "folder" .""",
        """<0x1> <docs> <0x10> .""",
        """<0x1> <docs> <0x11> .""",
        """<0x1> <docs> <0x12> .""",
        """<0x1> <dgraph.type> "Folder" .""",
        """<0x10> <name> "pub" .""",
        """<0x10> <dgraph.type> "PublicDoc" .""",
        """<0x11> <name> "alice doc" .""",
        """<0x11> <owner> "alice" .""",
        """<0x11> <dgraph.type> "OwnedDoc" .""",
        """<0x12> <name> "bob doc" .""",
        """<0x12> <owner> "bob" .""",
        """<0x12> <dgraph.type> "OwnedDoc" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """interface Doc {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |}
        |type PublicDoc implements Doc {
        |}
        |type OwnedDoc implements Doc @auth(
        |  query: { rule: "query($USER: String!) { queryOwnedDoc(filter: { owner: { eq: $USER } }) { __typename } }" }
        |){
        |  owner: String @search(by: [exact])
        |}
        |type Folder {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  docs: [Doc]
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // nested interface edge: per-implementer auth applies — alice sees
    // the public doc and her own, never bob's
    val alice = eng.json(
      """query { queryFolder { name docs { name } } }""",
      jwt = Map("USER" -> "alice")).collect()
    assert(alice.length == 1)
    val j = alice.head.getString(2)
    assert(j.contains("pub") && j.contains("alice doc") && !j.contains("bob doc"))
    // anonymous: only the public implementer under the edge
    val anon = eng.json(
      """query { queryFolder { name docs { name } } }""").collect()
    val j2 = anon.head.getString(2)
    assert(j2.contains("pub") && !j2.contains("alice doc") && !j2.contains("bob doc"))
  }

  test("@auth mutation rules: update/delete touch only authorized nodes, add gated by RBAC") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """text: string @index(exact) .
        |ownedBy: string @index(exact) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x10> <text> "alice note" .""",
        """<0x10> <ownedBy> "alice" .""",
        """<0x10> <dgraph.type> "Note" .""",
        """<0x11> <text> "bob note" .""",
        """<0x11> <ownedBy> "bob" .""",
        """<0x11> <dgraph.type> "Note" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Note @auth(
        |  update: { rule: "query($USER: String!) { queryNote(filter: { ownedBy: { eq: $USER } }) { __typename } }" },
        |  delete: { rule: "query($USER: String!) { queryNote(filter: { ownedBy: { eq: $USER } }) { __typename } }" },
        |  add: { rule: "{$ROLE: { eq: \"writer\" } }"}
        |){
        |  id: ID!
        |  text: String! @search(by: [exact])
        |  ownedBy: String @search(by: [exact])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    import org.apache.spark.sql.functions.{col, lit}
    val base = store.attr("text")
      .select(col("subject"), col("predicate"),
        col("value").cast("string").as("value"),
        lit(null).cast("string").as("lang"))
    // update with alice's claim rewrites only HER note, even though the
    // mutation filter matches both
    val updated = eng.mutate(
      """mutation { updateNote(input: {
        |  filter: { has: text }, set: { text: "redacted" } }) { } }""".stripMargin,
      base, jwt = Map("USER" -> "alice")).collect()
    val byUid = updated.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byUid(0x10L) == "redacted" && byUid(0x11L) == "bob note")
    // delete under bob's claim removes only bob's note
    val deleted = eng.mutate(
      """mutation { deleteNote(filter: { has: text }) { } }""",
      base, jwt = Map("USER" -> "bob")).collect()
    assert(deleted.map(_.getLong(0)).toSet == Set(0x10L))
    // add: RBAC gate
    assert(eng.mutate(
      """mutation { addNote(input: [{ text: "new" }]) { } }""",
      base, jwt = Map("ROLE" -> "writer")).count() == 3)
    val denied = intercept[Auth.AuthException] {
      eng.mutate("""mutation { addNote(input: [{ text: "new" }]) { } }""",
        base, jwt = Map("ROLE" -> "reader"))
    }
    assert(denied.getMessage.contains("not authorized"))
  }

  test("@auth graph add rule post-checks inserted nodes (authorizeNewNodes)") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """text: string @index(exact) .
        |ownedBy: string @index(exact) .
        |""".stripMargin)
    val seed = RdfSource.parse(Seq(
      """<0x10> <text> "seed" .""",
      """<0x10> <ownedBy> "alice" .""",
      """<0x10> <dgraph.type> "Note" .""").toDF("line"))
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap), seed)
    // a GRAPH rule on add: can't be evaluated pre-insert (the node isn't
    // in the graph yet) — the reference post-checks
    // `uid(newUids) @filter(rule)` in-txn and aborts on any miss
    // (graphql/resolve/mutation.go:598 authorizeNewNodes)
    val sdl = SdlParser.parse(
      """type Note @auth(
        |  add: { rule: "query($USER: String!) { queryNote(filter: { ownedBy: { eq: $USER } }) { __typename } }" }
        |){
        |  id: ID!
        |  text: String! @search(by: [exact])
        |  ownedBy: String @search(by: [exact])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // an insert whose ownedBy matches the claim passes the post-check
    val ok = eng.mutate(
      """mutation { addNote(input: [{ text: "mine", ownedBy: "alice" }]) { } }""",
      seed, jwt = Map("USER" -> "alice")).collect()
    assert(ok.exists(r => r.getString(1) == "text" && r.getString(3) == "mine"))
    // a forged owner fails; ONE failing node aborts the whole mutation
    // (reference: len(foundUIDs) != len(created) → "authorization failed")
    val denied = intercept[Auth.AuthException] {
      eng.mutate(
        """mutation { addNote(input: [
          |  { text: "mine", ownedBy: "alice" },
          |  { text: "forged", ownedBy: "mallory" }]) { } }""".stripMargin,
        seed, jwt = Map("USER" -> "alice"))
    }
    assert(denied.getMessage == "authorization failed")
    // no claim at all: the rule can't be satisfied — denied statically
    // pre-insert (the reference also short-circuits a static Negative,
    // mutation.go:658)
    intercept[Auth.AuthException] {
      eng.mutate(
        """mutation { addNote(input: [{ text: "x", ownedBy: "alice" }]) { } }""",
        seed)
    }
  }

  test("@secret + check<T>Password: two-block checkpwd rewrite (query_rewriter.go:335)") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """uname: string @index(exact) .
        |pwd: password .
        |""".stripMargin)
    // the store bcrypts password values at INGEST (types/password.go
    // Encrypt) — the fixture carries the plaintext
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        s"""<0x1> <uname> "user1" .""",
        s"""<0x1> <pwd> "secret123" .""",
        s"""<0x1> <dgraph.type> "User" .""",
        s"""<0x2> <uname> "user2" .""",
        s"""<0x2> <dgraph.type> "User" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type User @secret(field: "pwd") {
        |  id: ID!
        |  uname: String! @search(by: [exact])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // right password: the user renders
    val ok = eng.json(
      """query { checkUserPassword(uname: "user1", pwd: "secret123") {
        |  uname } }""".stripMargin).collect()
    assert(ok.length == 1 && ok.head.getString(2).contains("user1"))
    // wrong password / missing stored hash: empty, not an error
    assert(eng.json(
      """query { checkUserPassword(uname: "user1", pwd: "nope") {
        |  uname } }""".stripMargin).count() == 0)
    assert(eng.json(
      """query { checkUserPassword(uname: "user2", pwd: "anything") {
        |  uname } }""".stripMargin).count() == 0)
    // a type without @secret rejects the root with a clear error
    val e = intercept[Rewriter.RewriteException] {
      new GraphQLEngine(store, SdlParser.parse(
        """type User { id: ID! uname: String! @search(by: [exact]) }"""))
        .json("""query { checkUserPassword(uname: "user1", pwd: "x") { uname } }""")
    }
    assert(e.getMessage.contains("@secret"))
  }

  test("@include/@skip executable directives drop fields by variable") {
    val op = GqlParser.parse(
      """query Q($withLoc: Boolean!, $noName: Boolean!) {
        |  queryCustomer(first: 1) {
        |    name @skip(if: $noName)
        |    mktsegment @include(if: $withLoc)
        |    located_in @include(if: $withLoc) { name }
        |    acctbal @include(if: true) @skip(if: false)
        |  } }""".stripMargin,
      Map("withLoc" -> GBool(false), "noName" -> GBool(false)))
    assert(op.roots.head.children.map(_.name) == Seq("name", "acctbal"))
    val op2 = GqlParser.parse(
      """query { queryCustomer(first: 1) { name @include(if: false) } }""")
    assert(op2.roots.head.children.isEmpty)
    // a missing/non-boolean if is a parse-level error
    intercept[GqlParser.ParseException] {
      GqlParser.parse("""query { queryCustomer { name @include } }""")
    }
    intercept[GqlParser.ParseException] {
      GqlParser.parse("""query { queryCustomer { name @skip(if: "x") } }""")
    }
    // end-to-end: the dropped field is absent from the JSON
    val rows = engine.json(
      """query Q($b: Boolean!) {
        |  queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
        |    name
        |    mktsegment @include(if: $b) } }""".stripMargin,
      variables = Map("b" -> GBool(false))).collect()
    assert(rows.length == 1 && !rows.head.getString(2).contains("mktsegment"))
  }

  test("__typename renders the concrete type name as a constant field") {
    val rows = engine.json(
      """query { queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
        |  __typename name
        |  located_in { __typename name } } }""".stripMargin).collect()
    assert(rows.length == 1)
    val j = rows.head.getString(2)
    assert(j.contains(""""__typename":"Customer""""))
    assert(j.contains(""""__typename":"Nation""""))
    // interface __typename resolves each node's CONCRETE type (the
    // discriminator pattern): customers and suppliers both implement
    // Party and discriminate correctly
    val party = engine.json(
      """query { queryParty(filter: { name: { in:
        |  ["Customer#000000001", "Supplier#000000001"] } }) {
        |  __typename name } }""".stripMargin).collect().map(_.getString(2))
    assert(party.length == 2)
    assert(party.exists(j => j.contains(""""__typename":"Customer"""") &&
      j.contains("Customer#000000001")))
    assert(party.exists(j => j.contains(""""__typename":"Supplier"""") &&
      j.contains("Supplier#000000001")))
  }

  test("inline fragments: type conditions on interface queries, implementer-only fields") {
    // mirrors the reference's "query with fragments inside interface"
    // (query_test.yaml): fragment branches merge into the fetch; each
    // node renders only the fields its type carries
    val rows = engine.json(
      """query { queryParty(filter: { name: { in:
        |  ["Customer#000000001", "Supplier#000000001"] } }) {
        |  __typename
        |  name
        |  ... on Customer { mktsegment }
        |} }""".stripMargin).collect().map(_.getString(2))
    assert(rows.length == 2)
    val cust = rows.find(_.contains(""""__typename":"Customer"""")).get
    val supp = rows.find(_.contains(""""__typename":"Supplier"""")).get
    assert(cust.contains("mktsegment"))
    assert(!supp.contains("mktsegment"))
    // a fragment on an unrelated type is rejected
    val e = intercept[Rewriter.RewriteException] {
      engine.json("""query { queryParty { ... on Part { name } } }""")
    }
    assert(e.getMessage.contains("cannot apply"))
    // fragment on the type itself works on concrete queries too
    val c2 = engine.json(
      """query { queryCustomer(first: 1) { ... on Customer { name } } }""")
      .collect()
    assert(c2.length == 1 && c2.head.getString(2).contains("name"))
  }

  test("unions: union-typed edges discriminate via __typename and inline fragments") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |breed: string .
        |color: string .
        |pets: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <name> "ann" .""",
        """<0x1> <pets> <0x10> .""",
        """<0x1> <pets> <0x11> .""",
        """<0x1> <dgraph.type> "Human" .""",
        """<0x10> <name> "rex" .""",
        """<0x10> <breed> "lab" .""",
        """<0x10> <dgraph.type> "Dog" .""",
        """<0x11> <name> "tom" .""",
        """<0x11> <color> "grey" .""",
        """<0x11> <dgraph.type> "Cat" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """union Animal = Dog |
        |  Cat
        |type Dog {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  breed: String
        |}
        |type Cat {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  color: String
        |}
        |type Human {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  pets: [Animal]
        |}""".stripMargin)
    assert(sdl.typ("Animal").isInterface &&
      sdl.implementers("Animal") == Seq("Cat", "Dog"))
    val eng = new GraphQLEngine(store, sdl)
    // __typename INSIDE the fragments too (Apollo addTypename shape):
    // must discriminate per node, not collapse to one branch's constant
    val rows = eng.json(
      """query { queryHuman {
        |  name
        |  pets {
        |    ... on Dog { __typename name breed }
        |    ... on Cat { __typename name color }
        |  } } }""".stripMargin).collect()
    assert(rows.length == 1)
    val j = rows.head.getString(2)
    assert(j.contains(""""__typename":"Dog"""") && j.contains("lab"))
    assert(j.contains(""""__typename":"Cat"""") && j.contains("grey"))
    // a fragment on a non-member is rejected
    val e = intercept[Rewriter.RewriteException] {
      eng.json("""query { queryHuman { pets { ... on Human { name } } } }""")
    }
    assert(e.getMessage.contains("cannot apply"))
  }

  test("add<T> with nested objects and id references builds the edge subgraph") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |located_in: uid .
        |placed: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x5> <name> "FRANCE" .""",
        """<0x5> <dgraph.type> "Nation" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Nation {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |}
        |type Order {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |}
        |type Customer {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  located_in: Nation
        |  placed: [Order]
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    import org.apache.spark.sql.functions.{col, lit}
    // canonical triples base: the store's own shape
    val base = store.attr("name")
      .select(col("subject"), col("predicate"),
        lit(null).cast("long").as("objectUid"),
        col("value").cast("string").as("value"))
    val out = eng.mutate(
      """mutation { addCustomer(input: [{
        |  name: "new cust",
        |  located_in: { id: "0x5" },
        |  placed: [{ name: "order A" }, { name: "order B" }]
        |}]) { } }""".stripMargin, base)
    out.createOrReplaceTempView("g_addspec")
    val rows = out.collect()
    // the new customer links to the EXISTING nation 0x5
    val custUid = rows.find(r => r.getString(1) == "name" &&
      r.getString(3) == "new cust").get.getLong(0)
    assert(rows.exists(r => r.getLong(0) == custUid &&
      r.getString(1) == "located_in" && r.getLong(2) == 0x5L))
    // two nested orders allocated fresh uids, typed, linked
    val orderUids = rows.filter(r => r.getString(1) == "placed" &&
      r.getLong(0) == custUid).map(_.getLong(2)).toSet
    assert(orderUids.size == 2)
    val orderNames = rows.filter(r => r.getString(1) == "name" &&
      orderUids.contains(r.getLong(0))).map(_.getString(3)).toSet
    assert(orderNames == Set("order A", "order B"))
    assert(rows.exists(r => r.getString(1) == "dgraph.type" &&
      r.getString(3) == "Order"))
    // fresh uids never collide with existing ones
    assert(!orderUids.contains(0x5L) && custUid != 0x5L)
    // edge inputs against a scalar-only base are a clear error
    val e = intercept[Rewriter.RewriteException] {
      eng.mutate(
        """mutation { addCustomer(input: [{ name: "x",
          |  located_in: { id: "0x5" } }]) { } }""".stripMargin,
        base.drop("objectUid"))
    }
    assert(e.getMessage.contains("objectUid"))
  }

  test("geo filters: near/within GraphQL inputs map to the DQL geo generators") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """hname: string @index(exact) .
        |location: geo @index(geo) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <hname> "near hotel" .""",
        """<0x1> <location> "{\"type\":\"Point\",\"coordinates\":[22.22,11.11]}" .""",
        """<0x1> <dgraph.type> "Hotel" .""",
        """<0x2> <hname> "far hotel" .""",
        """<0x2> <location> "{\"type\":\"Point\",\"coordinates\":[80.0,60.0]}" .""",
        """<0x2> <dgraph.type> "Hotel" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Hotel {
        |  id: ID!
        |  hname: String! @search(by: [exact])
        |  location: Point @search
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // near: the query_test.yaml "Point query near filter" shape
    val near = eng.json(
      """query { queryHotel(filter: { location: { near: {
        |  distance: 100000, coordinate: { latitude: 11.11, longitude: 22.22 }
        |} } }) { hname } }""".stripMargin).collect()
    assert(near.length == 1 && near.head.getString(2).contains("near hotel"))
    // within: a polygon around the near hotel only
    val within = eng.json(
      """query { queryHotel(filter: { location: { within: { polygon: {
        |  coordinates: [{ points: [
        |    { latitude: 10, longitude: 21 },
        |    { latitude: 10, longitude: 23 },
        |    { latitude: 12, longitude: 23 },
        |    { latitude: 12, longitude: 21 },
        |    { latitude: 10, longitude: 21 } ] }] } } } }) { hname } }"""
        .stripMargin).collect()
    assert(within.length == 1 && within.head.getString(2).contains("near hotel"))
  }

  test("@cascade(fields:) at root and field-level @cascade map to the DQL forms") {
    // root parameterized cascade -> QueryBlock.cascadeFields
    val ast = rewrite(
      """query { queryCustomer @cascade(fields: ["placed"]) {
        |  name placed { orderstatus } } }""".stripMargin)
    assert(ast.blocks.head.cascade &&
      ast.blocks.head.cascadeFields == Seq("placed"))
    // field-level plain cascade -> selection-level cascade
    val ast2 = rewrite(
      """query { queryCustomer(first: 2) {
        |  name located_in @cascade { name } } }""".stripMargin)
    assert(ast2.blocks.head.selections.find(_.pred == "located_in")
      .exists(_.selCascade))
    // end-to-end: only customers with at least one order survive
    val rows = engine.json(
      """query { queryCustomer(filter: { acctbal: { lt: -990 } })
        |  @cascade(fields: ["placed"]) {
        |  name placed(first: 1) { orderstatus } } }""".stripMargin).collect()
    assert(rows.forall(_.getString(2).contains("orderstatus")))
    // NESTED parameterized cascade -> Selection.selCascadeFields
    // (reference query_rewriter.go:1729 applies the parameterized form
    // per child field)
    val ast3 = rewrite(
      """query { queryCustomer {
        |  name placed @cascade(fields: ["orderstatus"]) {
        |    orderstatus totalprice } } }""".stripMargin)
    assert(ast3.blocks.head.selections.find(_.pred == "placed")
      .exists(s => s.selCascade &&
        s.selCascadeFields == Seq("orderstatus")))
  }

  test("add<T> @id existence: duplicate errors, upsert: true updates, nested existing @id links") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val (preds, types) = SchemaRegistry.parseAlter(
      """uname: string @index(exact) .
        |score: string .
        |oname: string @index(exact) .
        |member: uid .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x5> <uname> "alice" .""",
        """<0x5> <score> "1" .""",
        """<0x5> <dgraph.type> "User" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type User {
        |  id: ID!
        |  uname: String! @id @search(by: [exact])
        |  score: String
        |}
        |type Org {
        |  id: ID!
        |  oname: String! @search(by: [exact])
        |  member: User
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    val base = RdfSource.parse(Seq(
      """<0x5> <uname> "alice" .""",
      """<0x5> <score> "1" .""",
      """<0x5> <dgraph.type> "User" .""").toDF("line"))
      .select(col("subject"), col("predicate"),
        col("objectUid").cast("long").as("objectUid"),
        col("value").cast("string").as("value"))
    // 1) plain add of an existing @id value errors with the reference text
    val e = intercept[Rewriter.RewriteException] {
      eng.mutate("""mutation { addUser(input: [{ uname: "alice", score: "9" }]) { } }""", base)
    }
    assert(e.getMessage ==
      "id alice already exists for field uname inside type User")
    // 2) upsert: true updates the EXISTING node in place: no new User,
    // score replaced (applySet set semantics)
    val up = eng.mutate(
      """mutation { addUser(upsert: true, input: [{ uname: "alice", score: "9" }]) { } }""",
      base).collect()
    assert(up.count(r => r.getString(1) == "dgraph.type" && r.getString(3) == "User") == 1)
    assert(up.filter(r => r.getString(1) == "score").map(r => (r.getLong(0), r.getString(3))).toSeq
      == Seq((0x5L, "9")))
    // 3) a NEW @id value still creates a node (upsert or not)
    val nw = eng.mutate(
      """mutation { addUser(upsert: true, input: [{ uname: "bob", score: "2" }]) { } }""",
      base).collect()
    assert(nw.count(r => r.getString(1) == "dgraph.type" && r.getString(3) == "User") == 2)
    // 4) nested input with an existing @id is a REFERENCE link even
    // without upsert (mutation_rewriter.go:1433) — other fields ignored
    val orgRows = eng.mutate(
      """mutation { addOrg(input: [{ oname: "acme", member: { uname: "alice" } }]) { } }""",
      base).collect()
    val orgUid = orgRows.find(r => r.getString(1) == "oname").get.getLong(0)
    assert(orgRows.exists(r => r.getLong(0) == orgUid &&
      r.getString(1) == "member" && r.getLong(2) == 0x5L))
    assert(orgRows.count(r => r.getString(1) == "dgraph.type" && r.getString(3) == "User") == 1)
  }

  test("add<T> review fixes: sibling roots, chained mutates, id references with extra fields") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |located_in: uid .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x5> <name> "FRANCE" .""",
        """<0x5> <dgraph.type> "Nation" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Nation { id: ID! name: String! @search(by: [exact]) }
        |type Customer {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  located_in: Nation
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    import org.apache.spark.sql.functions.{col, lit}
    val base = store.attr("name")
      .select(col("subject"), col("predicate"),
        lit(null).cast("long").as("objectUid"),
        col("value").cast("string").as("value"))
    // two add roots in ONE document: distinct uids, both survive
    val out1 = eng.mutate(
      """mutation {
        |  addCustomer(input: [{ name: "c one" }]) { }
        |  addCustomer(input: [{ name: "c two" }]) { }
        |}""".stripMargin, base).collect()
    val names1 = out1.filter(_.getString(1) == "name").map(_.getString(3))
    assert(names1.count(_ == "c one") == 1 && names1.count(_ == "c two") == 1)
    // scalar-only adds on a canonical base get dgraph.type rows
    assert(out1.exists(r => r.getString(1) == "dgraph.type" &&
      r.getString(3) == "Customer"))
    // chained mutates: the second allocation clears the first's uids
    val out2 = eng.mutate("""mutation { addCustomer(input: [{ name: "c3" }]) { } }""",
      eng.mutate("""mutation { addCustomer(input: [{ name: "c4" }]) { } }""", base))
      .collect()
    val names2 = out2.filter(_.getString(1) == "name").map(_.getString(3))
    assert(names2.count(_ == "c3") == 1 && names2.count(_ == "c4") == 1)
    // an edge input with id PLUS other fields references the existing
    // node (extra fields ignored, never a duplicate node)
    val out3 = eng.mutate(
      """mutation { addCustomer(input: [{ name: "c5",
        |  located_in: { id: "0x5", name: "IGNORED" } }]) { } }""".stripMargin,
      base).collect()
    assert(out3.exists(r => r.getString(1) == "located_in" &&
      r.getLong(2) == 0x5L))
    assert(!out3.exists(r => r.getString(1) == "name" &&
      r.getString(3) == "IGNORED"))
    assert(out3.count(r => r.getString(1) == "name" &&
      r.getString(3) == "FRANCE") == 1)
  }

  test("@include default in operation header applies to fragments declared first") {
    val op = GqlParser.parse(
      """fragment F on Customer { name mktsegment @include(if: $flag) }
        |query Q($flag: Boolean = false) {
        |  queryCustomer(first: 1) { ...F }
        |}""".stripMargin)
    assert(op.roots.head.children.map(_.name) == Seq("name"))
  }

  test("filter by id list rewrites to uid membership") {
    import graft.core.Uids
    val u1 = s"0x${(Uids.Customer + 1).toHexString}"
    val u3 = s"0x${(Uids.Customer + 3).toHexString}"
    val rows = engine.json(
      s"""query { queryCustomer(filter: { id: ["$u1", "$u3"] }) {
         |  name } }""".stripMargin).collect()
    assert(rows.length == 2)
    // composes with other filter entries (AND semantics)
    val one = engine.json(
      s"""query { queryCustomer(filter: { id: ["$u1", "$u3"],
         |  name: { eq: "Customer#000000001" } }) { name } }""".stripMargin)
      .collect()
    assert(one.length == 1 && one.head.getString(2).contains("Customer#000000001"))
  }

  // ---- round-10 auth hardening ----

  test("@auth cascaded-path graph rule admits only nodes with the full path") {
    // reference e2e/auth/schema.graphql Project pattern: the rule's
    // constraint lives ONLY in nested selections — rewrites to a
    // @cascade'd var block, NOT fail-open (the r9 behavior silently
    // granted unrestricted access here)
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """pname: string @index(exact) .
        |permission: string @index(exact) .
        |username: string @index(exact) .
        |roles: [uid] .
        |assignedTo: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x30> <pname> "p-alice-view" .""",
        """<0x30> <dgraph.type> "Project" .""",
        """<0x30> <roles> <0x31> .""",
        """<0x31> <permission> "VIEW" .""",
        """<0x31> <dgraph.type> "Role" .""",
        """<0x31> <assignedTo> <0x33> .""",
        """<0x40> <pname> "p-alice-admin-only" .""",
        """<0x40> <dgraph.type> "Project" .""",
        """<0x40> <roles> <0x41> .""",
        """<0x41> <permission> "ADMIN" .""",
        """<0x41> <dgraph.type> "Role" .""",
        """<0x41> <assignedTo> <0x33> .""",
        """<0x50> <pname> "p-bob-view" .""",
        """<0x50> <dgraph.type> "Project" .""",
        """<0x50> <roles> <0x51> .""",
        """<0x51> <permission> "VIEW" .""",
        """<0x51> <dgraph.type> "Role" .""",
        """<0x51> <assignedTo> <0x34> .""",
        """<0x33> <username> "alice" .""",
        """<0x33> <dgraph.type> "User" .""",
        """<0x34> <username> "bob" .""",
        """<0x34> <dgraph.type> "User" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Project @auth(
        |  query: { rule: "query($USER: String!) { queryProject { roles(filter: {permission: {eq: \"VIEW\"}}) { assignedTo(filter: {username: {eq: $USER}}) { __typename } } } }" }
        |){
        |  id: ID!
        |  pname: String @search(by: [exact])
        |  roles: [Role]
        |}
        |type Role {
        |  id: ID!
        |  permission: String @search(by: [exact])
        |  assignedTo: [User]
        |}
        |type User {
        |  id: ID!
        |  username: String @search(by: [exact])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    // alice holds a VIEW role only on 0x30 (0x40 is ADMIN — filtered out
    // mid-path, so the cascade drops the project)
    val alice = eng.json("query { queryProject { pname } }",
      jwt = Map("USER" -> "alice")).collect()
    assert(alice.length == 1 && alice.head.getString(2).contains("p-alice-view"))
    val bob = eng.json("query { queryProject { pname } }",
      jwt = Map("USER" -> "bob")).collect()
    assert(bob.length == 1 && bob.head.getString(2).contains("p-bob-view"))
    // no claim: the rule's $USER has no value -> FALSE, nothing renders
    assert(eng.json("query { queryProject { pname } }").count() == 0)
  }

  test("@auth RBAC array claims: in/eq match any element of a JWT array") {
    def b64(x: String) = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(x.getBytes("UTF-8"))
    val tok = b64("""{"alg":"none"}""") + "." +
      b64("""{"GROUPS":["dev","admin"],"USER":"alice"}""") + "."
    val claims = Auth.claimsFromJwt(tok)
    assert(claims("USER") == "alice")
    def rule(r: String): Auth.Node =
      Auth.parseDirective(s"""query: { rule: "$r"}""")("query")
    // in: any element of the array claim matches (was always-false via
    // asText() flattening arrays to "")
    assert(Auth.eval(rule("""{$GROUPS: { in: [\"admin\", \"root\"] } }"""),
      claims) == Left(true))
    assert(Auth.eval(rule("""{$GROUPS: { eq: \"dev\" } }"""),
      claims) == Left(true))
    assert(Auth.eval(rule("""{$GROUPS: { in: [\"root\"] } }"""),
      claims) == Left(false))
  }

  test("add<T> nested inputs enforce the NESTED type's add rule") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """aname: string @index(exact) .
        |ptitle: string @index(exact) .
        |posts: [uid] .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <aname> "seed" .""",
        """<0x1> <dgraph.type> "Author" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """type Author {
        |  id: ID!
        |  aname: String @search(by: [exact])
        |  posts: [Post]
        |}
        |type Post @auth(add: { rule: "{$ROLE: { eq: \"writer\" } }"}) {
        |  id: ID!
        |  ptitle: String @search(by: [exact])
        |}""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    import org.apache.spark.sql.functions.{col, lit}
    val base = store.attr("aname")
      .select(col("subject"), col("predicate"),
        lit(null).cast("long").as("objectUid"),
        col("value").cast("string").as("value"))
    // Author has no add rule, but the nested Post input must pass Post's
    // rule (reference post-checks every inserted node's type)
    val denied = intercept[Auth.AuthException] {
      eng.mutate(
        """mutation { addAuthor(input: [{ aname: "a",
          |  posts: [{ ptitle: "sneaky" }] }]) { } }""".stripMargin,
        base, jwt = Map("ROLE" -> "reader"))
    }
    assert(denied.getMessage.contains("addPost"))
    // with the writer claim the same mutation lands
    val ok = eng.mutate(
      """mutation { addAuthor(input: [{ aname: "a",
        |  posts: [{ ptitle: "legit" }] }]) { } }""".stripMargin,
      base, jwt = Map("ROLE" -> "writer")).collect()
    assert(ok.exists(r => r.getString(1) == "ptitle" && r.getString(3) == "legit"))
    // a plain Author add (no nested Post) needs no claim at all
    assert(eng.mutate(
      """mutation { addAuthor(input: [{ aname: "solo" }]) { } }""",
      base).count() >= 2)
  }

  test("@custom(dql:) query field runs its DQL document with GraphQL args as $vars") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      """pname: string @index(exact) .
        |score: int @index(int) .
        |""".stripMargin)
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq(
        """<0x1> <pname> "ann" .""",
        """<0x1> <score> "10" .""",
        """<0x1> <dgraph.type> "Player" .""",
        """<0x2> <pname> "bob" .""",
        """<0x2> <score> "3" .""",
        """<0x2> <dgraph.type> "Player" .""").toDF("line")))
    // single-quoted dql with escaped quotes, and args -> $vars binding
    val sdl = SdlParser.parse(
      """type Player {
        |  id: ID!
        |  pname: String! @search(by: [exact])
        |  score: Int @search
        |}
        |type Query {
        |  topPlayers(min: Int): [Player] @custom(dql: "query q($min: int) { topPlayers(func: ge(score, $min)) { pname score } }")
        |}""".stripMargin)
    assert(sdl.customDql.contains("topPlayers") &&
      sdl.customDql("topPlayers").args == Seq("min") &&
      sdl.customDql("topPlayers").typeName == "Player")
    // the Player type still parses normally after the field blanking
    assert(sdl.typ("Player").field("score").isDefined)
    val eng = new GraphQLEngine(store, sdl)
    val rows = eng.flat("""query { topPlayers(min: 5) { pname score } }""")
      .collect()
    assert(rows.length == 1 &&
      rows.head.getString(rows.head.fieldIndex("pname")) == "ann")
    // json path: custom root renders through the DQL JSON renderer
    val js = eng.json("""query { topPlayers(min: 1) { pname } }""")
      .collect()
    assert(js.length == 2)
    // block-string form parses too
    val sdl2 = SdlParser.parse(
      "type Player { id: ID! pname: String! }\n" +
        "type Query {\n" +
        "  all: [Player] @custom(dql: \"\"\"query {\n" +
        "    all(func: has(pname)) { pname }\n" +
        "  }\"\"\")\n" +
        "}")
    assert(sdl2.customDql("all").dql.contains("func: has(pname)"))
    assert(new GraphQLEngine(store, sdl2)
      .flat("query { all { pname } }").count() == 2)
  }

  test("introspection: __schema/__type answer from schema metadata (introspection.go)") {
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter("iname: string .\n")
    val store = new TripleFrameStore(spark,
      new SchemaRegistry(preds.map(p => p.name -> p).toMap,
        types.map(t => t.name -> t).toMap),
      RdfSource.parse(Seq("""<0x1> <iname> "x" .""").toDF("line")))
    val sdl = SdlParser.parse(
      """interface Pingable { ping: String }
        |type Author implements Pingable {
        |  id: ID!
        |  aname: String @search(by: [term])
        |  posts: [Post]
        |}
        |type Post { id: ID! title: String }""".stripMargin)
    val eng = new GraphQLEngine(store, sdl)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // __schema: root types + full type inventory, selection-driven
    val rows = eng.json(
      """query { __schema {
        |  queryType { name }
        |  mutationType { name }
        |  types { name kind }
        |} }""".stripMargin).collect()
    assert(rows.length == 1 && rows.head.getString(0) == "__schema")
    val sn = mapper.readTree(rows.head.getString(2))
    assert(sn.get("queryType").get("name").asText == "Query")
    assert(sn.get("mutationType").get("name").asText == "Mutation")
    val kinds = (0 until sn.get("types").size).map { i =>
      val t = sn.get("types").get(i)
      t.get("name").asText -> t.get("kind").asText
    }.toMap
    assert(kinds("Author") == "OBJECT" && kinds("Pingable") == "INTERFACE" &&
      kinds("String") == "SCALAR" && kinds("Query") == "OBJECT")
    // __type: fields with wrapped list types; fragments expand like any
    // selection (GraphiQL's FullType fragment pattern)
    val tn = mapper.readTree(eng.json(
      """query { __type(name: "Author") { ...F } }
        |fragment F on __Type {
        |  name kind
        |  fields { name type { kind name ofType { name } } }
        |  interfaces { name }
        |}""".stripMargin).collect().head.getString(2))
    assert(tn.get("kind").asText == "OBJECT")
    val byField = (0 until tn.get("fields").size).map(i => tn.get("fields").get(i))
      .map(f => f.get("name").asText -> f).toMap
    assert(byField("posts").get("type").get("kind").asText == "LIST" &&
      byField("posts").get("type").get("ofType").get("name").asText == "Post")
    assert(byField("aname").get("type").get("name").asText == "String")
    assert(tn.get("interfaces").get(0).get("name").asText == "Pingable")
    // interface: possibleTypes lists implementers; Query fields carry the
    // generated API surface
    val pi = mapper.readTree(eng.json(
      """query { __type(name: "Pingable") { kind possibleTypes { name } } }""")
      .collect().head.getString(2))
    assert(pi.get("kind").asText == "INTERFACE" &&
      pi.get("possibleTypes").get(0).get("name").asText == "Author")
    val q = mapper.readTree(eng.json(
      """query { __type(name: "Query") { fields { name } } }""")
      .collect().head.getString(2))
    val qf = (0 until q.get("fields").size)
      .map(i => q.get("fields").get(i).get("name").asText).toSet
    assert(Set("queryAuthor", "getPost", "aggregateAuthor").subsetOf(qf))
    // unknown type name → null (spec: __type returns null, not an error)
    assert(mapper.readTree(eng.json(
      """query { __type(name: "Nope") { name } }""")
      .collect().head.getString(2)).isNull)
  }

  test("SDL: consecutive union declarations both parse") {
    val sdl = SdlParser.parse(
      """type A { id: ID! x: String }
        |type B { id: ID! y: String }
        |type C { id: ID! z: String }
        |union U = A | B union V = C
        |type H { id: ID! u: [U] v: [V] }""".stripMargin)
    // unions model as fieldless interfaces; the greedy member pattern
    // used to swallow `union V` entirely
    assert(sdl.typ("U").isInterface && sdl.implementers("U").toSet == Set("A", "B"))
    assert(sdl.typ("V").isInterface && sdl.implementers("V") == Seq("C"))
  }

  test("directives on fragment spreads and inline fragments parse and apply") {
    // spec-legal: FragmentSpread and InlineFragment both carry Directives
    val op = GqlParser.parse(
      """query Q($x: Boolean! = false) {
        |  queryCustomer {
        |    ...core @include(if: $x)
        |    name
        |    ... on Customer @skip(if: true) { acctbal }
        |  }
        |}
        |fragment core on Customer { mktsegment }""".stripMargin)
    // both fragment branches dropped: only the plain field remains
    assert(op.roots.head.children.map(_.name) == Seq("name"))
    val op2 = GqlParser.parse(
      """query {
        |  queryCustomer {
        |    ... on Customer @skip(if: false) { acctbal }
        |  }
        |}""".stripMargin)
    val marker = op2.roots.head.children.head
    assert(marker.name == "\u0000on:Customer")
    assert(marker.children.map(_.name) == Seq("acctbal"))
  }

  test("subscriptions: @withSubscription poll observes a mutation, CDC-gated ticks skip re-runs") {
    // reference graphql/subscription/: poll-based — re-execute on a
    // tick, push only when the result hash changes
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      "text: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples0 = RdfSource.parse(Seq(
      """<0x1> <text> "v1" .""",
      """<0x1> <dgraph.type> "Note" .""").toDF("line"))
    val sdl = SdlParser.parse(
      """type Note @withSubscription {
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}""".stripMargin)
    assert(sdl.typ("Note").withSubscription)
    def mkEngine(tr: org.apache.spark.sql.DataFrame) =
      new GraphQLEngine(
        new TripleFrameStore(spark, reg, tr, Map.empty, materialize = false),
        sdl)
    val eng = mkEngine(triples0)
    val sub = eng.subscribe("subscription { queryNote { text } }")
    // first poll always emits
    val first = sub.poll(eng)
    assert(first.exists(_.collect().head.getString(2).contains("v1")))
    // unchanged data: the tick re-runs but emits nothing
    assert(sub.poll(eng).isEmpty)
    // a mutation lands; the next poll over the new store emits the change
    import org.apache.spark.sql.functions.{col, lit}
    val mutated = eng.mutate(
      """mutation { updateNote(input: {
        |  filter: { has: text }, set: { text: "v2" } }) { } }""".stripMargin,
      triples0.select(col("subject"), col("predicate"),
        col("value").cast("string").as("value"),
        col("lang").cast("string").as("lang")))
    val eng2 = mkEngine(mutated.select(col("subject"), col("predicate"),
      lit(null).cast("long").as("objectUid"), col("value"), col("lang"),
      lit(null).cast("string").as("facets")))
    val second = sub.poll(eng2)
    assert(second.exists(_.collect().head.getString(2).contains("v2")))
    // validation: a plain query doc and a non-@withSubscription type reject
    val e1 = intercept[Subscription.SubscriptionException] {
      eng.subscribe("query { queryNote { text } }")
    }
    assert(e1.getMessage.contains("subscription"))
    val noSub = SdlParser.parse(
      """type Note { id: ID! text: String! @search(by: [exact]) }""")
    val e2 = intercept[Subscription.SubscriptionException] {
      new GraphQLEngine(
        new TripleFrameStore(spark, reg, triples0, Map.empty,
          materialize = false), noSub)
        .subscribe("subscription { queryNote { text } }")
    }
    assert(e2.getMessage.contains("@withSubscription"))
    // CDC-gated ticks: an unchanged batch=N count skips re-execution
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_sub")
      .toFile
    val sub2 = eng.subscribe("subscription { queryNote { text } }")
    assert(sub2.pollCdc(eng, dir.getAbsolutePath).isDefined) // first tick
    // data changed but NO new CDC batch: the tick is a metadata listing
    assert(sub2.pollCdc(eng2, dir.getAbsolutePath).isEmpty)
    new java.io.File(dir, "batch=0").mkdirs()
    val after = sub2.pollCdc(eng2, dir.getAbsolutePath)
    assert(after.exists(_.collect().head.getString(2).contains("v2")))
  }

  test("JWT verification: HS256/RS256 signatures, exp, alg mismatch, Dgraph.Authorization wiring") {
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
    val good = hs256("""{"ROLE":"admin"}""", "topsecret")
    val claims = Auth.verifiedClaims(good, Auth.HmacSecret("topsecret"))
    assert(claims("ROLE") == "admin")
    // wrong secret and tampered payload both reject
    intercept[Auth.AuthException] {
      Auth.verifiedClaims(good, Auth.HmacSecret("wrong"))
    }
    val tampered = {
      val parts = good.split('.')
      parts(0) + "." + b64("""{"ROLE":"root"}""".getBytes("UTF-8")) +
        "." + parts(2)
    }
    intercept[Auth.AuthException] {
      Auth.verifiedClaims(tampered, Auth.HmacSecret("topsecret"))
    }
    // expired token rejects; unexpired passes
    val exp = hs256("""{"ROLE":"admin","exp":1000}""", "topsecret")
    intercept[Auth.AuthException] {
      Auth.verifiedClaims(exp, Auth.HmacSecret("topsecret"),
        nowEpochSeconds = 2000)
    }
    assert(Auth.verifiedClaims(exp, Auth.HmacSecret("topsecret"),
      nowEpochSeconds = 500)("ROLE") == "admin")
    // RS256: sign with a generated keypair, verify with the public PEM
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val h = b64("""{"alg":"RS256","typ":"JWT"}""".getBytes("UTF-8"))
    val pl = b64("""{"USER":"alice"}""".getBytes("UTF-8"))
    val signer = java.security.Signature.getInstance("SHA256withRSA")
    signer.initSign(kp.getPrivate)
    signer.update(s"$h.$pl".getBytes("UTF-8"))
    val rsTok = s"$h.$pl." + b64(signer.sign())
    val pem = "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder.encodeToString(
        kp.getPublic.getEncoded) + "\n-----END PUBLIC KEY-----"
    assert(Auth.verifiedClaims(rsTok,
      Auth.RsaPublicPem(pem))("USER") == "alice")
    // alg/key mismatch (token says HS256, key is RSA) rejects — the
    // classic key-confusion attack
    intercept[Auth.AuthException] {
      Auth.verifiedClaims(good, Auth.RsaPublicPem(pem))
    }
    // magic comment parses and the engine verifies through it
    val sdl = SdlParser.parse(
      """type Tweets @auth(query: { rule: "{$ROLE: { eq: \"admin\" } }"}) {
        |  id: ID!
        |  text: String! @search(by: [exact])
        |}
        |# Dgraph.Authorization {"VerificationKey":"topsecret","Header":"X-Auth","Namespace":"","Algo":"HS256"}
        |""".stripMargin)
    assert(sdl.authConfig.exists(c =>
      c.header == "X-Auth" && c.algo == "HS256" &&
        c.verificationKey == "topsecret"))
    assert(sdl.typ("Tweets").auth.contains("query"))
    val eng = new GraphQLEngine(
      graft.core.TripleStore(spark, sf), sdl)
    assert(eng.claimsFor(good)("ROLE") == "admin")
    intercept[Auth.AuthException] {
      eng.claimsFor(hs256("""{"ROLE":"admin"}""", "forged"))
    }
  }

  test("@lambda/@custom computed fields resolve via registered Column resolvers") {
    // reference graphql/schema/custom_http.go + the lambda server: a
    // computed field is resolved OUTSIDE the graph fetch, with the whole
    // parent visible. Spark-first form: a registered Column expression
    // over the parent row — distributed, no per-parent round-trip; the
    // HTTP transport of @custom is deployment plumbing behind the same
    // registry.
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions.{concat, lit}
    val sdl = SdlParser.parse(
      """type Customer {
        |  id: ID!
        |  name: String! @search(by: [exact])
        |  acctbal: Float @search
        |  bio: String @lambda
        |  rank: Int @custom(http: {url: "http://svc/rank", method: POST})
        |}""".stripMargin)
    assert(sdl.typ("Customer").field("bio").exists(_.isLambda))
    assert(sdl.typ("Customer").field("rank").get.customHttp
      .exists(_.contains("http://svc/rank")))
    val resolvers = Map[String, DataFrame => Column](
      "Customer.bio" -> (df => concat(lit("customer "), df("name"))),
      "Customer.rank" -> (df => (df("acctbal") > 0).cast("int")))
    val eng = new GraphQLEngine(TripleStore(spark, sf), sdl, resolvers)
    val rows = eng.flat(
      """query { queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
        |  name acctbal bio rank } }""".stripMargin).collect()
    assert(rows.length == 1)
    val r = rows.head
    val name = r.getString(r.fieldIndex("name"))
    assert(r.getString(r.fieldIndex("bio")) == s"customer $name")
    val bal = r.getDouble(r.fieldIndex("acctbal"))
    assert(r.getInt(r.fieldIndex("rank")) == (if (bal > 0) 1 else 0))
    // an unregistered computed field is a loud error, never a silent null
    val engNo = new GraphQLEngine(TripleStore(spark, sf), sdl)
    val e = intercept[Rewriter.RewriteException] {
      engNo.flat("query { queryCustomer { name bio } }")
    }
    assert(e.getMessage.contains("Customer.bio"))
  }

  test("@lambda dispatches to a configured lambda server with the reference envelope") {
    // reference wrappers.go:893 buildCustomDirectiveForLambda + the
    // dgraph-lambda sidecar: @lambda fields POST {"resolver":
    // "Type.field", "parents": [...]} to the lambda url (BATCH), and
    // the sidecar's JS returns an array aligned with parents. Loopback
    // emulator asserts the envelope and computes from the parents.
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val srv = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val lastResolver = new java.util.concurrent.atomic.AtomicReference[String]("")
    srv.createContext("/graphql-worker", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes, "UTF-8")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.readTree(body)
      lastResolver.set(n.get("resolver").asText())
      val parents = n.get("parents")
      val out = (0 until parents.size).map(i =>
        "\"bio of " + parents.get(i).get("name").asText() + "\"")
        .mkString("[", ",", "]").getBytes
      x.sendResponseHeaders(200, out.length)
      x.getResponseBody.write(out); x.close()
    })
    srv.start()
    val port = srv.getAddress.getPort
    try {
      val sdl = SdlParser.parse(
        """type Customer {
          |  id: ID!
          |  name: String! @search(by: [exact])
          |  bio: String @lambda
          |}""".stripMargin)
      val eng = new GraphQLEngine(TripleStore(spark, sf), sdl,
        lambdaUrl = Some(s"http://127.0.0.1:$port/graphql-worker"))
      val rows = eng.flat(
        """query { queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
          |  name bio } }""".stripMargin).collect()
      assert(rows.length == 1)
      val r = rows.head
      val name = r.getString(r.fieldIndex("name"))
      assert(r.getString(r.fieldIndex("bio")) == s"bio of $name")
      assert(lastResolver.get() == "Customer.bio")
      // a registered resolver still wins over the lambda server
      import org.apache.spark.sql.functions.lit
      val engOverride = new GraphQLEngine(TripleStore(spark, sf), sdl,
        resolvers = Map("Customer.bio" ->
          ((_: org.apache.spark.sql.DataFrame) => lit("local"))),
        lambdaUrl = Some(s"http://127.0.0.1:$port/graphql-worker"))
      val r2 = engOverride.flat(
        """query { queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
          |  name bio } }""".stripMargin).collect().head
      assert(r2.getString(r2.fieldIndex("bio")) == "local")
    } finally srv.stop(0)
  }

  test("@lambdaOnMutate fires the reference webhook payload to the lambda server") {
    // reference gqlschema.go:292 @lambdaOnMutate + resolve/webhook.go
    // sendWebhookEvent: after a mutation on a marked type, POST
    // {"resolver":"$webhook","event":{...}} to the lambda url —
    // fire-and-forget. Loopback emulator captures the payloads.
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.sources.RdfSource
    import spark.implicits._
    val payloads = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val srv = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    srv.createContext("/graphql-worker", (x: HttpExchange) => {
      payloads.add(new String(x.getRequestBody.readAllBytes, "UTF-8"))
      x.sendResponseHeaders(200, 2)
      x.getResponseBody.write("{}".getBytes); x.close()
    })
    srv.start()
    try {
      val (preds, types) = SchemaRegistry.parseAlter(
        "wtext: string @index(exact) .")
      val store = new TripleFrameStore(spark,
        new SchemaRegistry(preds.map(p => p.name -> p).toMap,
          types.map(t => t.name -> t).toMap),
        RdfSource.parse(Seq(
          """<0x10> <wtext> "keep" .""",
          """<0x10> <dgraph.type> "WNote" .""").toDF("line")))
      val sdl = SdlParser.parse(
        """type WNote @lambdaOnMutate(add: true, update: false, delete: true) {
          |  id: ID!
          |  wtext: String! @search(by: [exact])
          |}""".stripMargin)
      assert(sdl.typ("WNote").lambdaOnMutate == Set("add", "delete"))
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}/graphql-worker"
      val eng = new GraphQLEngine(store, sdl, lambdaUrl = Some(url))
      import org.apache.spark.sql.functions.{col, lit}
      val base = RdfSource.parse(Seq(
        """<0x10> <wtext> "keep" .""",
        """<0x10> <dgraph.type> "WNote" .""").toDF("line"))
      // webhooks are ASYNC fire-and-forget (the mutation never blocks
      // on the lambda server) — poll briefly for arrival
      def awaitPayload(pred: String => Boolean, what: String): String = {
        val deadline = System.currentTimeMillis + 10000
        while (System.currentTimeMillis < deadline) {
          payloads.toArray.map(_.toString).find(pred) match {
            case Some(p) => return p
            case None => Thread.sleep(25)
          }
        }
        fail(s"no $what webhook in $payloads")
      }
      // add fires with input + rootUIDs
      eng.mutate(
        """mutation { addWNote(input: [{ wtext: "hello" }]) { } }""",
        base).count()
      val add = awaitPayload(_.contains("\"operation\":\"add\""), "add")
      assert(add.contains("\"resolver\":\"$webhook\""), add)
      assert(add.contains("\"__typename\":\"WNote\""), add)
      assert(add.contains("\"input\":[{\"wtext\":\"hello\"}]"), add)
      assert("\"rootUIDs\":\\[\"0x[0-9a-f]+\"\\]".r.findFirstIn(add).isDefined, add)
      // update does NOT fire (update: false)
      payloads.clear()
      eng.mutate(
        """mutation { updateWNote(input: {
          |  filter: { wtext: { eq: "keep" } }, set: { wtext: "changed" } }) { } }""".stripMargin,
        base).count()
      Thread.sleep(400) // async window — give a wrong fire time to land
      assert(payloads.isEmpty, s"update must not fire: $payloads")
      // delete fires with the deleted root uid
      eng.mutate(
        """mutation { deleteWNote(filter: { wtext: { eq: "keep" } }) { } }""",
        base).count()
      val del = awaitPayload(_.contains("\"operation\":\"delete\""), "delete")
      assert(del.contains("\"delete\":{\"rootUIDs\":[\"0x10\"]}"), del)
    } finally srv.stop(0)
  }

  test("@custom(http:) EXECUTES: SINGLE per-parent substitution and BATCH per-partition calls") {
    // real loopback HTTP: the JDK server answers, the engine's executor-
    // side transport calls it (reference custom_http.go semantics)
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val srv = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    srv.createContext("/rank", (x: HttpExchange) => {
      // SINGLE: ?name=<url-encoded parent name> -> JSON number
      val q = x.getRequestURI.getQuery
      val name = java.net.URLDecoder.decode(q.stripPrefix("name="), "UTF-8")
      val out = (if (name.endsWith("1")) "7" else "3").getBytes
      x.sendResponseHeaders(200, out.length)
      x.getResponseBody.write(out); x.close()
    })
    srv.createContext("/batch", (x: HttpExchange) => {
      // BATCH: {"parents": [...]} -> array of name lengths, aligned
      seen.incrementAndGet()
      val body = new String(x.getRequestBody.readAllBytes, "UTF-8")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val parents = m.readTree(body).get("parents")
      val out = (0 until parents.size).map(i =>
        parents.get(i).get("name").asText().length).mkString("[", ",", "]").getBytes
      x.sendResponseHeaders(200, out.length)
      x.getResponseBody.write(out); x.close()
    })
    srv.start()
    val port = srv.getAddress.getPort
    try {
      val sdl = SdlParser.parse(
        s"""type Customer {
           |  id: ID!
           |  name: String! @search(by: [exact])
           |  acctbal: Float @search
           |  rank: Int @custom(http: {url: "http://127.0.0.1:$port/rank?name=$$name", method: GET})
           |  nameLen: Int @custom(http: {url: "http://127.0.0.1:$port/batch", method: POST, mode: BATCH})
           |}""".stripMargin)
      val eng = new GraphQLEngine(TripleStore(spark, sf), sdl)
      val rows = eng.flat(
        """query { queryCustomer(filter: { name: { eq: "Customer#000000001" } }) {
          |  name rank nameLen } }""".stripMargin).collect()
      assert(rows.length == 1)
      val r = rows.head
      val name = r.getString(r.fieldIndex("name"))
      assert(r.getInt(r.fieldIndex("rank")) == 7) // name ends in 1
      assert(r.getInt(r.fieldIndex("nameLen")) == name.length)
      assert(seen.get() >= 1) // the BATCH endpoint really served
      // spec parser: body template + defaults
      val spec = graft.graphql.CustomHttp.parse(
        """url: "http://x/y", method: POST, body: "{uid: $id}"""")
      assert(spec.method == "POST" && spec.body.contains("{uid: $id}")
        && spec.mode == "SINGLE")
    } finally srv.stop(0)
  }
}
