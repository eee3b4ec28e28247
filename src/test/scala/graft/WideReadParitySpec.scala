package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{TripleFrameStore, TripleStore}
import graft.exec.DqlExecutor

/** Equivalence guard for the r15 fast paths: tablet-group (wide) reads
  * and root-type elimination are TripleStore-only optimizations — the
  * same queries must return identical rows through the generic
  * per-predicate tablet path. The generic side is a TripleFrameStore
  * built from the store's own canonical backup frame, so any drift in
  * the wide frames' typed values, null semantics, or frontier identity
  * shows up as a row diff.
  */
final class WideReadParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val ts = TripleStore(spark, sf)
  private lazy val generic = new TripleFrameStore(spark, ts.schema,
    ts.backupTriples(Set.empty).get, ts.facetKeys, materialize = false)

  private def rows(store: graft.core.GraphStore, q: String): Seq[String] =
    new DqlExecutor(store).flat(q).collect()
      .map(_.toString).sorted.toSeq

  private def parity(q: String): Unit = {
    val a = rows(ts, q)
    val b = rows(generic, q)
    assert(a.nonEmpty, s"empty result would vacuously pass: $q")
    assert(a == b, s"wide-path drift on: $q\n" +
      s"wide=${a.take(3)}\ngeneric=${b.take(3)}")
  }

  /** Same store, wide reads disabled: attrWide/edgeTargetTypes stay at
    * the trait defaults, every other access path delegates. Used where
    * the generic TripleFrameStore renders a pre-existing DIFFERENT (but
    * equivalent) display form — datetime's timestamp-vs-RFC3339 — so
    * wide-vs-melted parity must compare within the one store.
    */
  private final class NoWideStore(u: graft.core.GraphStore)
      extends graft.core.GraphStore {
    def spark = u.spark
    def schema = u.schema
    def edges = u.edges
    def nodeTypes = u.nodeTypes
    def facetKeys = u.facetKeys
    def attr(p: String) = u.attr(p)
    override def annIndexDir(p: String) = u.annIndexDir(p)
  }

  private lazy val noWide = new NoWideStore(ts)

  private def parityNoWide(q: String): Unit = {
    val a = rows(ts, q)
    val b = rows(noWide, q)
    assert(a.nonEmpty, s"empty result would vacuously pass: $q")
    assert(a == b, s"wide-vs-melted drift on: $q\n" +
      s"wide=${a.take(3)}\nmelted=${b.take(3)}")
  }

  test("bare type root, multi-attr: root-type elimination == generic") {
    parity("""{ q(func: type(Part)) { name brand ptype size retailprice } }""")
  }

  test("var-block math over wide attrs + val-seeded root == generic") {
    parity("""{ var(func: type(Part)) { sz as size  rp as retailprice
              |    m as math(cond(sz % 2.0 == 0.0, sqrt(rp), -rp)) }
              |  q(func: ge(val(m), 0.0), orderasc: val(m), first: 50) {
              |    a: val(m) } }""".stripMargin)
  }

  test("filtered type root (no elimination, wide join) == generic") {
    parity("""{ q(func: type(Lineitem)) @filter(gt(quantity, 49.0)) {
              |    returnflag linestatus quantity extendedprice discount } }"""
      .stripMargin)
  }

  test("index-seeded root with wide join == generic") {
    parity("""{ q(func: gt(size, 45)) { brand ptype retailprice } }""")
  }

  test("full cascade over wide attrs (null-filter branch) == generic") {
    parity("""{ q(func: type(Part)) @cascade { size retailprice } }""")
  }

  test("mixed wide + non-wide siblings (name spans tables) == generic") {
    // `name` lives in five entity tables; under a bare type(Part) root
    // the registry restricts to Part's table, so name/brand/size all
    // ride ONE wide frame — which must still read exactly what the five
    // melted branches would have delivered for Part subjects.
    // (datetime attrs are out of scope here: the two stores render
    // different but equivalent display forms — timestamp toString vs
    // the RFC3339 display rider — a pre-existing store difference the
    // wide path neither causes nor touches, datetime being ineligible)
    parity("""{ q(func: type(Part)) { name brand size } }""")
  }

  test("bare Customer root: cross-entity preds restrict to one table") {
    // name spans 5 tables and acctbal 2, but the known root type prunes
    // the union to customer's table — single-entity group, root-type
    // elimination applies
    parity("""{ q(func: type(Customer)) { name mktsegment acctbal } }""")
  }

  test("paged Customer root: pruned single-table group under paging == generic") {
    // `first:` blocks root-type ELIMINATION, but the frontier hint
    // comes from the root func name alone (type(Customer) →
    // rootFrontierTypes = {Customer} regardless of paging), so the
    // name∪acctbal group still prunes to the customer table — this
    // case pins the paged-but-pruned path; the has(name) case below
    // exercises the full union at the root
    parity("""{ q(func: type(Customer), first: 70, orderasc: name) {
              |    name acctbal } }""".stripMargin)
  }

  test("attribute root over all owners: full five-table union group == generic") {
    // has(name)'s frontier is name's five owner types, so nothing
    // prunes: name+acctbal+mktsegment+brand+ptype form one connected
    // component over {Region, Nation, Customer, Supplier, Part}
    // (m = 5 tables ≤ k = 5 preds passes the cost guard) — the widest
    // union group the registry can produce, left-joined against a
    // five-entity frontier with typed nulls in every branch
    parity("""{ q(func: has(name), first: 300, orderasc: name) {
              |    name acctbal mktsegment brand ptype } }""".stripMargin)
  }

  test("mixed-entity frontier (customers ∪ suppliers) union group == generic") {
    // ~located_in fans out to customers AND suppliers; name+acctbal
    // coalesce as a union wide frame spanning both uid bands
    parity("""{ q(func: type(Nation)) { name
              |    inhab: ~located_in { name acctbal } } }""".stripMargin)
  }

  test("union group with a typed-null column (mktsegment) == generic") {
    // suppliers have no mktsegment: the union branch carries a typed
    // null, which must read back exactly like the melted tablet's
    // missing row (left-join null)
    parity("""{ q(func: type(Nation)) { name
              |    inhab: ~located_in { name mktsegment acctbal } } }"""
      .stripMargin)
  }

  test("datetime rides the wide group: bare Order root == melted path") {
    // orderdate joined the registry in r17 — the wide column is the
    // same cast-to-timestamp of the same source column, so a bare
    // type(Order) root projects status+price+date off ONE frame
    parityNoWide("""{ q(func: type(Order)) {
                   |    orderstatus totalprice orderdate } }""".stripMargin)
  }

  test("datetime wide read under filter + ordering == melted path") {
    parityNoWide("""{ q(func: type(Lineitem), first: 80, orderasc: shipdate)
                   |    @filter(gt(quantity, 49.0)) {
                   |    shipdate quantity returnflag } }""".stripMargin)
  }

  test("full cascade over a union group's typed-null column == generic") {
    // cascade turns the wide read's left join into a null filter: on a
    // customers∪suppliers frontier the suppliers (no mktsegment) must
    // drop exactly like the melted path's inner join drops them
    parity("""{ q(func: type(Nation)) @cascade { name
              |    inhab: ~located_in { name mktsegment acctbal } } }"""
      .stripMargin)
  }

  // ---- r17 optimization: @groupby / level-agg tablet-group reads ----
  // groupbyGroups and aggregateBlock now fetch co-located key and
  // aggregate-input predicates through ONE wide join (plus the
  // edgeObjectsUnique dedup skip in groupbyBlock). NoWideStore keeps
  // every trait default (no attrWide, no edgeObjectsUnique), so these
  // compare the full fast path against the melted per-predicate joins
  // WITH the dedup exchange; the generic-store parity re-checks the
  // same rows through a different physical layout.

  test("@groupby keys + aggregates ride one wide join == melted + dedup") {
    val q = """{ q(func: type(Order)) {
              |    has_line @groupby(returnflag, linestatus) {
              |      n: count(uid)  sq: sum(quantity)
              |      mn: min(extendedprice)  mx: max(extendedprice)
              |      av: avg(discount) } } }""".stripMargin
    parityNoWide(q)
    parity(q)
  }

  test("root-level @groupby over a wide pair == melted path") {
    val q = """{ q(func: type(Lineitem)) @groupby(returnflag, linestatus) {
              |    n: count(uid) } }""".stripMargin
    parityNoWide(q)
    parity(q)
  }

  test("duplicate-source aggregates (min+max of one pred) == melted path") {
    // exercises the shared-join dedup branch for a NON-wide source too:
    // a single covered pred gains no wide group, so min+max of
    // extendedprice alias one melted tablet join
    val q = """{ q(func: type(Order)) {
              |    has_line @groupby(returnflag) {
              |      mn: min(extendedprice)  mx: max(extendedprice) } } }"""
      .stripMargin
    parityNoWide(q)
    parity(q)
  }

  test("@groupby union-group KEY over a mixed-entity frontier == melted") {
    // r18: multi-table union groups became KEY-eligible in groupbyGroups.
    // The key (mktsegment: Customer-only) and aggregate input (acctbal:
    // Customer ∪ Supplier) form one two-table union wide group over a
    // customers∪suppliers frontier; the IsNotNull key guard must drop
    // suppliers exactly like the melted inner key join drops their
    // missing tablet rows — NOT land them in a null group.
    val q = """{ q(func: type(Nation)) { name
              |    inhab: ~located_in @groupby(mktsegment) {
              |      n: count(uid)  mn: min(acctbal)  mx: max(acctbal) } } }"""
      .stripMargin
    parityNoWide(q)
    parity(q)
  }

  test("root @groupby union-group key (has-seeded two-band frontier) == melted") {
    val q = """{ q(func: has(acctbal)) @groupby(mktsegment) {
              |    n: count(uid)  av: avg(acctbal) } }""".stripMargin
    parityNoWide(q)
    parity(q)
  }

  test("level aggregation over sibling preds rides one wide join") {
    val q = """{ q(func: type(Lineitem)) {
              |    mq: max(quantity)  sx: sum(extendedprice)
              |    ad: avg(discount) } }""".stripMargin
    parityNoWide(q)
    parity(q)
  }
}
