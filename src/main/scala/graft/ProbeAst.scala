package graft
import org.apache.spark.sql.SparkSession
object ProbeAst {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ts = graft.core.TripleStore(spark, "/root/testdata/sf0.001")
    val gql =
      """query {
        |  queryCustomer(filter: { mktsegment: { eq: "BUILDING" } },
        |                order: { asc: name }, first: 10) {
        |    name
        |    located_in { name }
        |    placed(order: { desc: orderdate }, first: 2) { orderstatus }
        |  } }""".stripMargin
    val ast = new graft.graphql.GraphQLEngine(ts).rewrite(gql)
    println("[ast] " + ast)
    spark.stop()
  }
}
