package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Bucketing, TripleStore}

/** The 100 TB layout claim, observed: joining two subject-bucketed
  * tables plans ZERO shuffle exchanges, while the same join on plain
  * parquet shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed edge/attr join eliminates all shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val ts = TripleStore(spark, sf)
      Bucketing.writeBucketed(
        ts.edge("has_line").select(col("subject"), col("object")),
        "b_has_line", buckets = 8)
      Bucketing.writeBucketed(
        ts.attr("totalprice"), "b_totalprice", buckets = 8)

      val bucketed = spark.table("b_has_line")
        .join(spark.table("b_totalprice"), Seq("subject"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"expected no shuffle in bucketed join:\n$bucketedPlan")

      val plain = ts.edge("has_line").select(col("subject"), col("object"))
        .join(ts.attr("totalprice"), Seq("subject"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), "plain join should shuffle")

      // same answers either way
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_has_line")
      spark.sql("DROP TABLE IF EXISTS b_totalprice")
    }
  }
}
