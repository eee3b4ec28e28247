package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{SchemaRegistry, TripleFrameStore}
import graft.sources.RdfSource

/** Dotted predicate names (director.film, film.rating — the reference's
  * datasets use dotted predicates throughout, e.g. its film corpus):
  * every surface that turns a predicate into a DataFrame column must
  * backtick-quote it, or Spark reads the dot as struct access.
  */
class DotPredicateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val store = {
    val (preds, types) = SchemaRegistry.parseAlter(
      """name: string @index(exact) .
        |director.film: [uid] @reverse @count .
        |film.rating: int @index(int) .
        |""".stripMargin)
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    new TripleFrameStore(spark, reg, RdfSource.parse(Seq(
      """<0x1> <name> "Baz" .""",
      """<0x2> <name> "Gatsby" .""",
      """<0x2> <film.rating> "7" .""",
      """<0x3> <name> "Romeo" .""",
      """<0x3> <film.rating> "9" .""",
      """<0x1> <director.film> <0x2> .""",
      """<0x1> <director.film> <0x3> .""").toDF("line")), Map.empty)
  }
  private def ex = new graft.exec.DqlExecutor(store)

  test("dotted predicates traverse, render, reverse, count, order, filter") {
    val js = ex.jsonAll(
      """{ q(func: eq(name, "Baz")) { name director.film { name film.rating } } }""")
      .collect().map(_.getString(2)).mkString
    assert(js.contains("director.film") && js.contains("Gatsby") &&
      js.contains("film.rating"))
    // reverse edge over a dotted predicate
    assert(ex.flat("""{ q(func: eq(name, "Gatsby")) { name ~director.film { name } } }""")
      .count() == 1)
    // count at edge + count-index filter
    val cnt = ex.jsonAll(
      """{ q(func: gt(count(director.film), 1)) { name count(director.film) } }""")
      .collect().map(_.getString(2)).mkString
    assert(cnt.contains("\"count(director.film)\":2"), cnt)
    // child order by a dotted attr + child filter on it
    val ordered = ex.jsonAll(
      """{ q(func: eq(name, "Baz")) {
        |    director.film (orderdesc: film.rating, first: 1)
        |      @filter(ge(film.rating, 8)) { name } } }""".stripMargin)
      .collect().map(_.getString(2)).mkString
    assert(ordered.contains("Romeo") && !ordered.contains("Gatsby"), ordered)
    // root func on the dotted attr; value var through it
    val v = ex.jsonAll(
      """{ var(func: eq(name, "Baz")) { director.film { r as film.rating } }
        |  q(func: uid(r), orderasc: val(r)) { name rating: val(r) } }""".stripMargin)
      .collect().map(_.getString(2)).mkString
    assert(v.contains(""""rating":7""") && v.contains(""""rating":9"""), v)
    // recurse over the dotted edge
    val rec = ex.jsonAll(
      """{ q(func: eq(name, "Baz")) @recurse(depth: 2) { name director.film } }""")
      .collect().map(_.getString(2)).mkString
    assert(rec.contains("Gatsby"), rec)
  }
}
