package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.plans.GraftOptimizations

/** The regexp→StartsWith rule must change the physical plan (pushed
  * source filter) without changing results.
  */
class OptimizerSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("anchored prefix regex becomes a pushed StringStartsWith filter") {
    GraftOptimizations.install(spark)
    val df = Tables.load(spark, sf, "part").filter(col("p_name").rlike("^green .*"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("StringStartsWith"),
      s"expected pushed StringStartsWith in:\n$physical")
    // results identical to the unrewritten predicate evaluated row-wise
    val expected = Tables.load(spark, sf, "part")
      .collect().count(_.getAs[String]("p_name").startsWith("green "))
    assert(df.count() == expected)
  }

  test("non-prefix regexes are left untouched") {
    GraftOptimizations.install(spark)
    val df = Tables.load(spark, sf, "part")
      .filter(col("p_name").rlike("^(green|blue) (bolt|rod)$"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("StringStartsWith"))
    assert(physical.contains("RLIKE") || physical.toLowerCase.contains("rlike"))
  }

  test("installing the rule twice does not duplicate it") {
    GraftOptimizations.install(spark)
    GraftOptimizations.install(spark)
    val n = spark.experimental.extraOptimizations
      .count(_ == graft.plans.RegexpPrefixToStartsWith)
    assert(n == 1)
  }
}
