package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Acl, AclStore, Namespaces, SchemaRegistry, TripleFrameStore}
import graft.exec.DqlExecutor
import graft.graphql.Auth
import graft.sources.RdfSource

/** ACL + multi-tenancy (reference acl/ + ee/acl/acl.go): login issues a
  * verified access JWT; group rules gate per-predicate reads (bitmask
  * READ=4 WRITE=2 MODIFY=1); unauthorized predicates resolve EMPTY (the
  * reference filters them out of queries silently); namespaces isolate
  * tenants through a pruned `ns` partition column.
  */
class AclSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val reg = {
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |salary: int @index(int) .
        |""".stripMargin)
    new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
  }

  private lazy val store = new TripleFrameStore(spark, reg,
    RdfSource.parse(Seq(
      """<0x1> <name> "ann" .""",
      """<0x1> <salary> "100" .""",
      """<0x1> <dgraph.type> "Emp" .""",
      """<0x2> <name> "bob" .""",
      """<0x2> <salary> "200" .""",
      """<0x2> <dgraph.type> "Emp" .""").toDF("line")),
    Map.empty, materialize = false)

  private lazy val acl = new Acl(
    users = Map(
      "alice" -> Acl.User("alice",
        Acl.hashPassword("alice", "alicepw"), Set("dev")),
      "root" -> Acl.User("root",
        Acl.hashPassword("root", "rootpw"), Set(Acl.Guardians))),
    groups = Map(
      "dev" -> Seq(Acl.Rule("name", Acl.Read),
        Acl.Rule("salary", Acl.Write))), // write-only: READ not granted
    secret = "acl-secret")

  test("login verifies bcrypt and issues a signature-checked access JWT") {
    val tok = acl.login("alice", "alicepw")
    val c = acl.claims(tok)
    assert(c("userid") == "alice" && c("groups") == "dev" &&
      c("namespace") == "0")
    // wrong password and unknown user reject identically
    val e1 = intercept[Acl.AclException] { acl.login("alice", "nope") }
    val e2 = intercept[Acl.AclException] { acl.login("mallory", "x") }
    assert(e1.getMessage == e2.getMessage)
    // a forged token (wrong secret) fails claim verification
    val forged = new Acl(Map("alice" -> Acl.User("alice",
      Acl.hashPassword("alice", "alicepw"), Set(Acl.Guardians))),
      Map.empty, "other-secret").login("alice", "alicepw")
    intercept[Auth.AuthException] { acl.claims(forged) }
  }

  test("unauthorized predicates resolve empty; guardians see everything") {
    val aliceStore = acl.storeFor(store, acl.login("alice", "alicepw"))
    // readable predicate: full results
    val names = new DqlExecutor(aliceStore)
      .flat("""{ q(func: has(name)) { name } }""")
    assert(names.count() == 2)
    // salary grants WRITE but not READ: the query silently returns
    // nothing (reference worker/acl.go drops unauthorized predicates)
    val salaries = new DqlExecutor(aliceStore)
      .flat("""{ q(func: has(salary)) { salary } }""")
    assert(salaries.count() == 0)
    // a readable root with an unreadable leaf renders the leaf absent
    val mixed = new DqlExecutor(aliceStore)
      .flat("""{ q(func: has(name)) { name salary } }""")
      .collect()
    assert(mixed.length == 2 &&
      mixed.forall(r => r.isNullAt(r.fieldIndex("salary"))))
    // guardians bypass rules
    val rootStore = acl.storeFor(store, acl.login("root", "rootpw"))
    assert(new DqlExecutor(rootStore)
      .flat("""{ q(func: has(salary)) { salary } }""").count() == 2)
  }

  test("namespace views isolate tenants and drop the ns column") {
    val multi = RdfSource.parse(Seq(
      """<0x1> <name> "t0-ann" .""",
      """<0x1> <dgraph.type> "Emp" .""").toDF("line"))
      .withColumn("ns", lit(0L))
      .unionByName(RdfSource.parse(Seq(
        """<0x1> <name> "t1-zoe" .""",
        """<0x1> <dgraph.type> "Emp" .""").toDF("line"))
        .withColumn("ns", lit(1L)))
    def engineFor(ns: Long) = new DqlExecutor(new TripleFrameStore(spark,
      reg, Namespaces.view(multi, ns), Map.empty, materialize = false))
    // same uid, same predicate, different tenants — never mixed
    val t0 = engineFor(0).flat("""{ q(func: has(name)) { name } }""")
      .select("name").as[String].collect().toSeq
    val t1 = engineFor(1).flat("""{ q(func: has(name)) { name } }""")
      .select("name").as[String].collect().toSeq
    assert(t0 == Seq("t0-ann") && t1 == Seq("t1-zoe"))
  }

  test("mutation write enforcement: blocked list errors, guardians exempt, ACL preds frozen") {
    val alice = acl.login("alice", "alicepw")
    val root = acl.login("root", "rootpw")
    // alice's dev group: salary carries Write, name only Read
    acl.authorizeMutation(alice, Seq("salary"))
    val e = intercept[Acl.AclException] {
      acl.authorizeMutation(alice, Seq("salary", "name", "age"))
    }
    // errors with the FULL blocked list (edgraph/access.go:839), not
    // first-failure — and write-granted preds aren't in it
    assert(e.getMessage ==
      "unauthorized to mutate following predicates: age name")
    // the `*` of an S * * wildcard delete is not a predicate
    acl.authorizeMutation(alice, Seq("salary", "*"))
    // guardians mutate anything...
    acl.authorizeMutation(root, Seq("name", "salary", "anything"))
    // ...except the ACL predicates themselves (access.go:815)
    val g = intercept[Acl.AclException] {
      acl.authorizeMutation(root, Seq("name", "dgraph.rule.permission"))
    }
    assert(g.getMessage ==
      "unauthorized to mutate acl predicates: dgraph.rule.permission")
    // frame form: distinct predicates of set+delete frames
    val sets = Seq((3L, "salary", "300")).toDF("subject", "predicate", "value")
    val dels = Seq((3L, "name")).toDF("subject", "predicate")
    acl.authorizeMutationFrames(root, sets, dels)
    val f = intercept[Acl.AclException] {
      acl.authorizeMutationFrames(alice, sets, dels)
    }
    assert(f.getMessage ==
      "unauthorized to mutate following predicates: name")
  }

  test("AclStore.edges filters to readable predicates only") {
    val s = new AclStore(store, Set("name").contains _)
    assert(s.edges.select("predicate").distinct().as[String].collect()
      .forall(_ == "name"))
  }

  test("groups are namespaced: a tenant's rules never grant or bleed across tenants") {
    val a = new Acl(Map.empty, Map.empty, "ns-secret")
    // same group NAME in two namespaces, different rules
    a.addGroup("eng", Seq(Acl.Rule("name", Acl.Read)), ns = 0L)
    a.addGroup("eng", Seq.empty, ns = 5L) // tenant 5's eng grants nothing
    assert(a.canRead(Set("eng"), "name", ns = 0L))
    // the tenant's "eng" must NOT inherit ns-0's READ rule
    assert(!a.canRead(Set("eng"), "name", ns = 5L))
    // a tenant guardian editing ITS eng leaves ns-0's untouched
    a.updateGroupRules("eng", Seq(Acl.Rule("salary", Acl.Write)),
      Set.empty, ns = 5L)
    assert(a.getGroup("eng", 0L).contains(Seq(Acl.Rule("name", Acl.Read))))
    assert(a.canWrite(Set("eng"), "salary", ns = 5L) &&
      !a.canWrite(Set("eng"), "salary", ns = 0L))
    // deleting the tenant's group strips membership only in ns 5
    a.addUser(Acl.User("u0", Acl.hashPassword("u0", "p"), Set("eng"),
      namespace = 0L))
    a.addUser(Acl.User("u5", Acl.hashPassword("u5", "p"), Set("eng"),
      namespace = 5L))
    a.deleteGroup("eng", ns = 5L)
    assert(a.getUser("u0", 0L).exists(_.groups.contains("eng")))
    assert(a.getUser("u5", 5L).exists(!_.groups.contains("eng")))
    assert(a.getGroup("eng", 0L).nonEmpty && a.getGroup("eng", 5L).isEmpty)
    // listGroups is per-namespace
    assert(a.listGroups(0L).map(_._1) == Seq("eng") &&
      a.listGroups(5L).isEmpty)
    // token-driven read enforcement resolves within the TOKEN's namespace
    val t5 = {
      a.addUser(Acl.User("zoe", Acl.hashPassword("zoe", "zp"), Set("eng"),
        namespace = 5L))
      a.addGroup("eng", Seq.empty, ns = 5L) // re-add, still grants nothing
      a.login("zoe", "zp", namespace = 5L)
    }
    assert(new DqlExecutor(a.storeFor(store, t5))
      .flat("""{ q(func: has(name)) { name } }""").count() == 0)
  }

  test("user keys are tuples: a '#'-bearing ns-0 id never aliases a tenant user") {
    val a = new Acl(Map.empty, Map.empty, "tuple-secret")
    a.addUser(Acl.User("5#groot", Acl.hashPassword("5#groot", "evil"),
      Set.empty, namespace = 0L))
    // with a delimited-string key this addUser would throw "already
    // exists" (ukey(0,"5#groot") == ukey(5,"groot")); tuples keep them apart
    a.addUser(Acl.User("groot", Acl.hashPassword("groot", "good"),
      Set(Acl.Guardians), namespace = 5L))
    assert(a.getUser("groot", 5L).exists(_.groups == Set(Acl.Guardians)))
    assert(a.getUser("5#groot", 0L).exists(_.groups.isEmpty))
    // tenant login uses the TENANT's hash, not the squatter's
    val tok = a.login("groot", "good", namespace = 5L)
    assert(a.claims(tok)("namespace") == "5")
    intercept[Acl.AclException] { a.login("groot", "evil", namespace = 5L) }
    // teardown drops the tenant's users AND groups, the squatter survives
    a.addGroup("eng", Nil, ns = 5L)
    a.dropNamespaceUsers(5L)
    assert(a.getUser("groot", 5L).isEmpty && a.getGroup("eng", 5L).isEmpty)
    assert(a.getUser("5#groot", 0L).nonEmpty)
  }

  test("a token missing or mangling the namespace claim is rejected, not ns-0") {
    // forge validly-SIGNED tokens (the instance's own secret) whose
    // tenancy claim is absent / non-numeric: neither may fall through
    // to namespace 0, the most-privileged galaxy
    def forge(payloadJson: String): String = {
      def b64(x: Array[Byte]) = java.util.Base64.getUrlEncoder
        .withoutPadding.encodeToString(x)
      val header = b64("""{"alg":"HS256","typ":"JWT"}""".getBytes("UTF-8"))
      val payload = b64(payloadJson.getBytes("UTF-8"))
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        "acl-secret".getBytes("UTF-8"), "HmacSHA256"))
      s"$header.$payload." +
        b64(mac.doFinal(s"$header.$payload".getBytes("UTF-8")))
    }
    val missing = forge("""{"userid":"alice","groups":["dev"]}""")
    val mangled = forge(
      """{"userid":"alice","groups":["dev"],"namespace":"galaxy"}""")
    val e1 = intercept[Acl.AclException] { acl.storeFor(store, missing) }
    assert(e1.getMessage.contains("missing the namespace claim"))
    val e2 = intercept[Acl.AclException] {
      acl.authorizeMutation(mangled, Seq("salary"))
    }
    assert(e2.getMessage.contains("malformed namespace claim"))
    // a well-formed login token still resolves
    acl.storeFor(store, acl.login("alice", "alicepw"))
  }
}
