package graft
import org.apache.spark.sql.SparkSession
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ts = graft.core.TripleStore(spark, "/root/testdata/sf0.001")
    val dqlT =
      """{
        |  queryCustomer(func: eq(mktsegment, "BUILDING"), orderasc: name, first: 10)
        |      @filter(type(Customer)) {
        |    name
        |    located_in { name }
        |    placed(orderdesc: orderdate, first: 2) { orderstatus }
        |  } }""".stripMargin
    def stats(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(k: String) = p.split(k, -1).length - 1
      println(s"[plan] $label exchanges=${c("Exchange")} sorts=${c("Sort ")} " +
        s"aggs=${c("HashAggregate")} joins=${c("Join")} scans=${c("Scan parquet")} windows=${c("Window")}")
    }
    stats("uid=true", new graft.exec.DqlExecutor(ts).jsonAll(dqlT))
    stats("uid=false", new graft.exec.DqlExecutor(ts).jsonAllAst(
      graft.dql.Parser.parse(dqlT), includeUid = false))
    spark.stop()
  }
}
