package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{TripleStore, Uids}
import Q._

/** Relational face of the operator inventory (SURVEY.md §2.2/2.5/2.7/2.8):
  * root-function index scans, aggregations, sorts/pagination, set ops.
  *
  * Each entry is a Spark plan plus a DuckDB oracle. Scans stay fully
  * declarative so Catalyst pushes filters/projections into the parquet
  * scan (reference's tokenizer index selection, worker/tokens.go:78, is
  * subsumed by Parquet min/max pruning — SURVEY.md §4).
  */
object RelationalQueries {

  private val dec182 = DecimalType(18, 2)
  private val dec62 = DecimalType(6, 2)

  val queries: Map[String, QFn] = Map(
    // ---- flagship aggregation (TPC-H Q1 shape; reference §2.5 min/max/sum/avg) ----
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum(col("l_extendedprice").cast(dec182) * (lit(1) - col("l_discount").cast(dec62)))
            .cast("double").as("sum_disc"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- root functions = index scans (§2.2) ----
    "root_eq" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))),

    "root_eq_multi" -> ((s, d) =>
      t(s, d, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment")).orderBy(col("c_custkey"))),

    "root_ineq" -> ((s, d) =>
      t(s, d, "part").filter(col("p_size") <= 10 && col("p_size") > 2)
        .select(col("p_partkey"), col("p_size")).orderBy(col("p_partkey"))),

    "root_between" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31")))
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy(col("o_orderkey"))),

    "root_has" -> ((s, d) => {
      // has(placed): all subjects carrying the predicate (worker/task.go:2679)
      val ts = TripleStore(s, d)
      ts.edge("placed").select(col("subject")).distinct().orderBy(col("subject"))
    }),

    "root_uid_in" -> ((s, d) => {
      // uid_in(located_in, <nation 5>): subjects whose edge points at uid
      val ts = TripleStore(s, d)
      ts.edge("located_in")
        .filter(col("object") === lit(Uids.Nation + 5L))
        .select(col("subject")).orderBy(col("subject"))
    }),

    "root_type" -> ((s, d) => {
      // type(T) root + per-type cardinality (dql/parser.go:1704)
      val ts = TripleStore(s, d)
      ts.nodeTypes.groupBy(col("typeName")).agg(count(lit(1)).as("n"))
        .orderBy(col("typeName"))
    }),

    "term_anyofterms" -> ((s, d) =>
      // anyofterms(p_name, "green small"): term-index union (tok/tok.go:369)
      t(s, d, "part")
        .filter(arrays_overlap(split(col("p_name"), " "), array(lit("green"), lit("small"))))
        .select(col("p_partkey"), col("p_name")).orderBy(col("p_partkey"))),

    "term_allofterms" -> ((s, d) =>
      // allofterms = token intersection (worker/task.go:303, algo/uidlist.go:297)
      t(s, d, "part")
        .filter(forall(array(lit("small"), lit("widget")),
          x => array_contains(split(col("p_name"), " "), x)))
        .select(col("p_partkey"), col("p_name")).orderBy(col("p_partkey"))),

    "root_regexp" -> ((s, d) =>
      // regexp(p_name, /^(green|blue) (bolt|rod)$/) (worker/task.go:1240)
      t(s, d, "part").filter(col("p_name").rlike("^(green|blue) (bolt|rod)$"))
        .select(col("p_partkey"), col("p_name")).orderBy(col("p_partkey"))),

    "match_fuzzy" -> ((s, d) =>
      // match(n_name, "NATION_1", 2): Levenshtein (worker/match.go:63)
      t(s, d, "nation")
        .filter(levenshtein(col("n_name"), lit("NATION_1")) <= 2)
        .select(col("n_nationkey"), col("n_name")).orderBy(col("n_nationkey"))),

    "count_eq" -> ((s, d) => {
      // eq(count(placed), 10): count-index compare (worker/task.go:1222)
      val ts = TripleStore(s, d)
      ts.edge("placed").groupBy(col("subject")).agg(count(lit(1)).as("c"))
        .filter(col("c") === 10).orderBy(col("subject"))
    }),

    "count_histogram" -> ((s, d) => {
      // distribution of count(placed) — count-index as data
      val ts = TripleStore(s, d)
      ts.edge("placed").groupBy(col("subject")).agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("n_subjects")).orderBy(col("c"))
    }),

    // ---- sorts / pagination (§2.7) ----
    "sort_page" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(10).limit(20)),

    "sort_multi" -> ((s, d) =>
      t(s, d, "customer")
        .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc, col("c_custkey").asc)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .limit(50)),

    "sort_first_per_parent" -> ((s, d) => {
      // per-parent `first: 3` pagination: top-3 lines per order by price
      // (reference paginates each uidMatrix row, query/query.go:2493)
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber) is not unique in this dataset, so the
      // tie-break chain goes through enough columns to totally order rows
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc, col("l_quantity").asc)
      // the window's ENSURE_REQUIREMENTS exchange is small in BYTES
      // (WindowGroupLimit caps ≤3 rows/key/map-partition) but CPU-dense
      // (per-key sort over every surviving row), so AQE's size-based
      // coalescing collapsed it to ONE task (ProbeGate: 6 tasks total,
      // maxTask ≈ wall). A user-origin repartition on the window key is
      // not coalesced: the stage keeps spark.sql.shuffle.partitions
      // (cpus-/cluster-derived, scale-adaptive), same rows per key,
      // identical results.
      t(s, d, "lineitem")
        .repartition(col("l_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("rn"))
        .orderBy(col("l_orderkey"), col("rn"))
    }),

    // ---- set ops over uid sets (§2.8, algo/uidlist.go) ----
    "setop_union" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        .union(o.filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k")))
        .distinct().orderBy(col("k"))
    }),

    "setop_intersect" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        .intersect(o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    "setop_except" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.select(col("c_custkey").as("k"))
        .except(o.select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    // ---- global aggregation ----
    "agg_global" -> ((s, d) =>
      t(s, d, "customer").agg(
        count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        dsum(col("c_acctbal")).as("sum_bal"),
        davg(col("c_acctbal")).as("avg_bal"))),

    "groupby_agg" -> ((s, d) =>
      // @groupby analogue (query/groupby.go:195 formResult)
      t(s, d, "orders").groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_date"))
        .orderBy(col("o_orderpriority"))),

    // ---- math over values (§2.5 math(...), query/math.go) ----
    "math_expr" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).as("fl"),
        ceil(col("o_totalprice")).as("ce"),
        sqrt(col("o_orderkey").cast("double")).as("sq"),
        ((col("o_orderkey") % 10) * (col("o_orderkey") % 10) * (col("o_orderkey") % 10)).as("cube"),
        when(col("o_totalprice") > 100000, lit("big")).otherwise(lit("small")).as("flag"))
        .orderBy(col("o_orderkey")))
  )

  private val NB = Uids.Nation
  private val CB = Uids.Customer
  private val SB = Uids.Supplier
  private val OB = Uids.Order

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlDsum("l_quantity")} AS sum_qty,
         | ${sqlDsum("l_extendedprice")} AS sum_base,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DOUBLE) AS sum_disc,
         | ${sqlDavg("l_quantity")} AS avg_qty,
         | COUNT(*) AS n
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "root_eq" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    "root_eq_multi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','MACHINERY') ORDER BY c_custkey""".stripMargin,

    "root_ineq" ->
      "SELECT p_partkey, p_size FROM part WHERE p_size <= 10 AND p_size > 2 ORDER BY p_partkey",

    "root_between" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "root_has" ->
      s"SELECT DISTINCT $CB + o_custkey AS subject FROM orders ORDER BY subject",

    "root_uid_in" ->
      s"""SELECT $CB + c_custkey AS subject FROM customer WHERE c_nationkey = 5
         |UNION ALL
         |SELECT $SB + s_suppkey AS subject FROM supplier WHERE s_nationkey = 5
         |ORDER BY subject""".stripMargin,

    "root_type" ->
      """SELECT * FROM (
        | SELECT 'Region' AS typeName, COUNT(*) AS n FROM region UNION ALL
        | SELECT 'Nation', COUNT(*) FROM nation UNION ALL
        | SELECT 'Customer', COUNT(*) FROM customer UNION ALL
        | SELECT 'Supplier', COUNT(*) FROM supplier UNION ALL
        | SELECT 'Part', COUNT(*) FROM part UNION ALL
        | SELECT 'Order', COUNT(*) FROM orders UNION ALL
        | SELECT 'Lineitem', COUNT(*) FROM lineitem UNION ALL
        | SELECT 'Document', COUNT(*) FROM documents UNION ALL
        | SELECT 'Embedding', COUNT(*) FROM embeddings
        |) ORDER BY typeName""".stripMargin,

    "term_anyofterms" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE list_has_any(string_split(p_name, ' '), ['green','small'])
        |ORDER BY p_partkey""".stripMargin,

    "term_allofterms" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE list_has_all(string_split(p_name, ' '), ['small','widget'])
        |ORDER BY p_partkey""".stripMargin,

    "root_regexp" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '^(green|blue) (bolt|rod)$')
        |ORDER BY p_partkey""".stripMargin,

    "match_fuzzy" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE levenshtein(n_name, 'NATION_1') <= 2 ORDER BY n_nationkey""".stripMargin,

    "count_eq" ->
      s"""SELECT $CB + o_custkey AS subject, COUNT(*) AS c FROM orders
         |GROUP BY o_custkey HAVING COUNT(*) = 10 ORDER BY subject""".stripMargin,

    "count_histogram" ->
      """SELECT c, COUNT(*) AS n_subjects FROM (
        | SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey
        |) GROUP BY c ORDER BY c""".stripMargin,

    "sort_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20 OFFSET 10""".stripMargin,

    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC LIMIT 50""".stripMargin,

    "sort_first_per_parent" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        | SELECT l_orderkey, l_linenumber, l_extendedprice,
        |   ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |     ORDER BY l_extendedprice DESC, l_linenumber ASC,
        |       l_partkey ASC, l_suppkey ASC, l_quantity ASC) AS rn
        | FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,

    "setop_union" ->
      """SELECT DISTINCT k FROM (
        | SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION ALL
        | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
        |) ORDER BY k""".stripMargin,

    "setop_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
        |ORDER BY k""".stripMargin,

    "setop_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,

    "agg_global" ->
      s"""SELECT COUNT(*) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
         | ${sqlDsum("c_acctbal")} AS sum_bal, ${sqlDavg("c_acctbal")} AS avg_bal
         |FROM customer""".stripMargin,

    "groupby_agg" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price,
         | strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
         | strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "math_expr" ->
      """SELECT o_orderkey,
        | CAST(FLOOR(o_totalprice) AS BIGINT) AS fl,
        | CAST(CEIL(o_totalprice) AS BIGINT) AS ce,
        | SQRT(CAST(o_orderkey AS DOUBLE)) AS sq,
        | (o_orderkey % 10) * (o_orderkey % 10) * (o_orderkey % 10) AS cube,
        | CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS flag
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
