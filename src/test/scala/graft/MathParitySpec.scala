package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SchemaRegistry, TripleFrameStore}
import graft.exec.DqlExecutor
import graft.sources.RdfSource

/** Typed math-evaluator parity with the reference's own unit corpus
  * (query/math_test.go TestProcessBinary/TestProcessUnary): int∘int
  * stays INT (integer division, exact 2^55-scale sums), any float
  * operand promotes the result to FLOAT, pow/logbase/ln/exp always
  * yield FLOAT, min/max preserve the operand type. Each case runs
  * through the full DQL surface (`math(<expr>)` over one node) and
  * asserts both the VALUE and the Spark-side TYPE (long vs double) —
  * the type is what decides whether JSON renders `4` or `4.0`.
  *
  * Divergence, documented: the reference ABORTS the query on ln/sqrt
  * of a negative and on int-negation overflow (math_test.go
  * errorTests). The distributed engine clamps ln(x <= 0) to
  * -MaxFloat64 — matching the reference's own JSON encoding of the
  * -Inf it produces for ln(0) — rather than failing a 10^9-row job on
  * one bad value; sqrt of a negative yields NULL (omitted from JSON).
  */
class MathParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private lazy val exec: DqlExecutor = {
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter("name: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq(
      """<0x1> <name> "n" .""").toDF("line")).localCheckpoint()
    new DqlExecutor(new TripleFrameStore(spark, reg, triples, Map.empty,
      materialize = false))
  }

  private def evalMath(expr: String): Any = {
    val rows = exec.flat(s"{ q(func: uid(0x1)) { r: math($expr) } }").collect()
    assert(rows.length == 1, s"math($expr) returned ${rows.length} rows")
    rows.head.getAs[Any]("r")
  }

  // (expr, expected) — expected's Scala type IS the assertion on the
  // reference's out Tid (Long ↔ IntID, Double ↔ FloatID)
  private val binaryCases: Seq[(String, Any)] = Seq(
    // + : int∘int → int, float promotes
    "2 + 2" -> 4L,
    "2.0 + 2" -> 4.0,
    "2.0 + 2.0" -> 4.0,
    // int sums stay exact past the 53-bit double mantissa
    "48038396025285290 + 2" -> 48038396025285292L,
    "100 - 1" -> 99L,
    "100.0 - 1" -> 99.0,
    "100.0 - 1.0" -> 99.0,
    "3 * 3" -> 9L,
    "3.0 * 3" -> 9.0,
    "3.0 * 3.0" -> 9.0,
    // / : int∘int is INTEGER division (TestProcessBinary 12/4 → IntID 3)
    "12 / 4" -> 3L,
    "12.0 / 4" -> 3.0,
    "12.0 / 4.0" -> 3.0,
    "10 % 2" -> 0L,
    "10.0 % 2" -> 0.0,
    "10.0 % 2.0" -> 0.0,
    // min/max preserve type
    "max(1, 100)" -> 100L,
    "max(1.0, 100)" -> 100.0,
    "max(1.0, 100.0)" -> 100.0,
    "min(1, 100)" -> 1L,
    "min(1.0, 100)" -> 1.0,
    "min(1.0, 100.0)" -> 1.0,
    // logbase/pow always FLOAT, even on int operands
    "logbase(16, 2)" -> 4.0,
    "pow(2, 3)" -> 8.0,
    // an int lexeme past Int64 falls back to a FLOAT literal instead of
    // failing the query (reference dql math parsing: ParseInt overflow
    // retries ParseFloat) — 2^64 is not representable as int64
    "18446744073709551616 + 1" -> 1.8446744073709552e19,
    "18446744073709551616 * 0.0" -> 0.0)

  private val unaryCases: Seq[(String, Any)] = Seq(
    "ln(15)" -> 2.70805020110221,
    "exp(1)" -> 2.718281828459045,
    "sqrt(9.0)" -> 3.0,
    "floor(2.5)" -> 2.0,
    "ceil(2.5)" -> 3.0)

  test("binary math: reference TestProcessBinary typed outcomes") {
    binaryCases.foreach { case (expr, expected) =>
      val got = evalMath(expr)
      (expected, got) match {
        case (e: Double, g: Double) =>
          assert(math.abs(g - e) <= math.abs(e) * 1e-12 + 1e-12,
            s"math($expr): got $g, want $e")
        case _ =>
          assert(got == expected,
            s"math($expr): got $got (${got.getClass.getSimpleName}), " +
              s"want $expected (${expected.getClass.getSimpleName})")
      }
      // the TYPE is part of the contract: long renders 4, double 4.0
      assert(got.getClass == expected.getClass,
        s"math($expr): type ${got.getClass} != ${expected.getClass}")
    }
  }

  test("unary math: reference TestProcessUnary typed outcomes") {
    unaryCases.foreach { case (expr, expected) =>
      val got = evalMath(expr)
      (expected, got) match {
        case (e: Double, g: Double) =>
          assert(math.abs(g - e) <= math.abs(e) * 1e-12 + 1e-12,
            s"math($expr): got $g, want $e")
          assert(got.getClass == expected.getClass)
        case _ =>
          assert(got == expected, s"math($expr): got $got, want $expected")
      }
    }
  }

  test("ternary cond: reference TestProcessTernary shape") {
    // cond(true-ish, t, f) picks by the boolean; type follows branches
    assert(evalMath("cond(1 == 1, 5, 9)") == 5L)
    assert(evalMath("cond(1 == 2, 5, 9)") == 9L)
    assert(evalMath("cond(2 > 1, 5.0, 9)") == 5.0)
  }

  test("bigfloat var aggregation is decimal-exact (reference TestBigFloatSum/Max/Lt/Gt)") {
    // reference query4_test.go TestBigFloat*: 200-bit big.Float; this
    // engine's documented narrowing is DECIMAL(38,24) — wide enough for
    // every value in the reference's own fixtures, and the SUM below is
    // the reference's exact expected digits (a double path yields
    // ...6431999... instead of ...64320000000001)
    import spark.implicits._
    val (preds, types) = SchemaRegistry.parseAlter(
      "amount: bigfloat @index(bigfloat) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq(
      """<0x666> <amount> "100" .""",
      """<0x124> <amount> "99.1231231233" .""",
      """<0x777> <amount> "99" .""",
      """<0x888> <amount> "99.0000000000000000000001" .""",
      """<0x123> <amount> "123123.123123123132" .""").toDF("line"))
    val ex = new DqlExecutor(new TripleFrameStore(spark, reg, triples,
      Map.empty, materialize = false))
    val js = ex.jsonAll(
      """{ me(func: has(amount)) { amount as amount }
        |  q() { sum_amt : sum(val(amount)) } }""".stripMargin)
      .filter("block = 'q'").collect().map(_.getString(2)).mkString
    assert(js.contains("\"sum_amt\":123520.2462462464320000000001"), js)
    val mx = ex.jsonAll(
      """{ me(func: has(amount)) { amount as amount }
        |  q() { max_amt : max(val(amount)) } }""".stripMargin)
      .filter("block = 'q'").collect().map(_.getString(2)).mkString
    assert(mx.contains("\"max_amt\":123123.123123123132"), mx)
    val mn = ex.jsonAll(
      """{ me(func: has(amount)) { amount as amount }
        |  q() { min_amt : min(val(amount)) } }""".stripMargin)
      .filter("block = 'q'").collect().map(_.getString(2)).mkString
    assert(mn.contains("\"min_amt\":99"), mn)
    // lt/gt range scans over the bigfloat index distinguish values one
    // unit in the 22nd decimal place apart (TestBigFloatLt/Gt)
    val lt = ex.flat(
      """{ me(func: lt(amount, "99.0000000000000000000001")) { amount } }""")
      .collect()
    assert(lt.length == 1) // only the exact 99
    val gt = ex.flat(
      """{ me(func: gt(amount, "100")) { amount } }""").collect()
    assert(gt.length == 1) // only 123123.12...
  }
}
