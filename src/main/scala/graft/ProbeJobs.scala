package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch tooling: count jobs/stages/tasks/shuffle per query variant —
  * contention-free plan-shape metrics.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shuffle = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("PROBE_CALLSITES"))
          println("[site] " + Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def measure(label: String)(fn: => Unit): Unit = {
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); shuffle.set(0)
      val t0 = System.nanoTime()
      fn
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobs] $label%-32s jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d shufMB=${shuffle.get / 1e6}%8.1f t=$dt%6.2f")
    }
    val ts = graft.core.TripleStore(spark, "/root/testdata/sf0.1")
    ts.attr("quantity").count()
    val gql =
      """query {
        |  queryCustomer(filter: { mktsegment: { eq: "BUILDING" } },
        |                order: { asc: name }, first: 10) {
        |    name
        |    located_in { name }
        |    placed(order: { desc: orderdate }, first: 2) { orderstatus }
        |  } }""".stripMargin
    val dqlT =
      """{
        |  queryCustomer(func: eq(mktsegment, "BUILDING"), orderasc: name, first: 10)
        |      @filter(type(Customer)) {
        |    name
        |    located_in { name }
        |    placed(orderdesc: orderdate, first: 2) { orderstatus }
        |  } }""".stripMargin
    val eng = new graft.graphql.GraphQLEngine(ts)
    measure("graphql_json warm1")(eng.json(gql).count())
    measure("graphql_json")(eng.json(gql).count())
    measure("dql includeUid=true") {
      new graft.exec.DqlExecutor(ts).jsonAll(dqlT).count()
    }
    measure("dql includeUid=false") {
      new graft.exec.DqlExecutor(ts).jsonAllAst(
        graft.dql.Parser.parse(dqlT), includeUid = false).count()
    }
    measure("dql flat") {
      new graft.exec.DqlExecutor(ts).flat(dqlT).count()
    }
    spark.stop()
  }
}
