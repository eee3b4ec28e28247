package graft

import org.apache.spark.sql.SparkSession

/** Scratch instrumentation main (builder tooling): dissect graphql_json
  * into its component stages.
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime()
      fn
      println(f"[probe2] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val ts = graft.core.TripleStore(spark, sfDir)
    time("warmup line")(ts.attr("quantity").count())
    val gql =
      """query {
        |  queryCustomer(filter: { mktsegment: { eq: "BUILDING" } },
        |                order: { asc: name }, first: 10) {
        |    name
        |    located_in { name }
        |    placed(order: { desc: orderdate }, first: 2) { orderstatus }
        |  } }""".stripMargin
    val eng = new graft.graphql.GraphQLEngine(ts)
    for (i <- 1 to 3)
      time(s"graphql_json full $i")(eng.json(gql).count())
    // the rewritten DQL, run directly
    val dql =
      """{
        |  queryCustomer(func: eq(mktsegment, "BUILDING"), orderasc: name, first: 10) {
        |    name
        |    located_in { name }
        |    placed(orderdesc: orderdate, first: 2) { orderstatus }
        |  } }""".stripMargin
    for (i <- 1 to 2)
      time(s"dql json direct $i") {
        new graft.exec.DqlExecutor(ts).jsonAll(dql).count()
      }
    // flat (no JSON rendering)
    for (i <- 1 to 2)
      time(s"dql flat direct $i") {
        new graft.exec.DqlExecutor(ts).flat(dql).count()
      }
    // direct DQL WITH the type filter the rewriter adds
    val dqlT =
      """{
        |  queryCustomer(func: eq(mktsegment, "BUILDING"), orderasc: name, first: 10)
        |      @filter(type(Customer)) {
        |    name
        |    located_in { name }
        |    placed(orderdesc: orderdate, first: 2) { orderstatus }
        |  } }""".stripMargin
    for (i <- 1 to 2)
      time(s"dql json + typefilter $i") {
        new graft.exec.DqlExecutor(ts).jsonAll(dqlT).count()
      }
    // same AST through jsonAllAst includeUid=false (GraphQL shape)
    for (i <- 1 to 2)
      time(s"dql json includeUid=false $i") {
        new graft.exec.DqlExecutor(ts).jsonAllAst(
          graft.dql.Parser.parse(dqlT), includeUid = false).count()
      }
    // root only
    val root =
      """{
        |  q(func: eq(mktsegment, "BUILDING"), orderasc: name, first: 10) {
        |    name } }""".stripMargin
    for (i <- 1 to 2)
      time(s"root only json $i") {
        new graft.exec.DqlExecutor(ts).jsonAll(root).count()
      }
    spark.stop()
  }
}
