package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch tooling (builder-only): job/stage/task counts + wall time for
  * named SparkEntry gates under different AQE coalesce settings. The r12
  * scored bench showed trivial-data gates (setop_intersect 20.4 s STEADY on
  * ~20k rows) drowning in micro-tasks on a contended host — this measures
  * exactly how many tasks each gate schedules and what
  * `coalescePartitions.parallelismFirst=false` saves.
  */
object ProbeGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gates =
      if (args.nonEmpty) args.toSeq
      else Seq("setop_intersect", "setop_except", "setop_union",
        "mutation_delete", "mutation_unique", "recurse_chain",
        "root_bigfloat", "schema_alter_index", "shortest_k2",
        "mutation_upsert", "recurse_paths")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val shuffle = new AtomicLong
    val gcMs = new AtomicLong; val runMs = new AtomicLong
    val maxTaskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("PROBE_CALLSITES"))
          println("[site] root=" +
            Option(j.properties.getProperty("spark.sql.execution.root.id"))
              .getOrElse("?") +
            " cs=" + Option(j.properties.getProperty("callSite.short"))
              .getOrElse("?"))
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        gcMs.addAndGet(s.stageInfo.taskMetrics.jvmGCTime)
        runMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        ()
      }
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
            if sys.env.contains("PROBE_CALLSITES") =>
          println(s"[exec] ${s.executionId} ${s.description.take(120)}")
        case _ => ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        // stage skew: the longest single task of the run
        Option(t.taskInfo).foreach { ti =>
          val d = ti.duration
          var cur = maxTaskMs.get
          while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get
        }
        ()
      }
    })
    def measure(label: String)(fn: => Unit): Unit = {
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); shuffle.set(0)
      gcMs.set(0); runMs.set(0); maxTaskMs.set(0)
      val t0 = System.nanoTime()
      try fn catch { case t: Throwable => println(s"[gate] ERR $label: ${t.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[gate] $label%-42s jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d shufMB=${shuffle.get / 1e6}%7.1f gcS=${gcMs.get / 1e3}%6.2f cpuS=${runMs.get / 1e3}%7.1f maxTaskS=${maxTaskMs.get / 1e3}%6.2f t=$dt%6.2f")
    }
    // warm the shared session state once so per-gate numbers are steady-state
    graft.core.TripleStore(spark, sfDir).attr("quantity").count()
    for (pf <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      println(s"=== parallelismFirst=$pf ===")
      gates.foreach { g =>
        SparkEntry.queries.get(g) match {
          case Some(fn) =>
            measure(s"$g warm")(fn(spark, sfDir).count())
            measure(s"$g steady")(fn(spark, sfDir).count())
          case None => println(s"[gate] unknown: $g")
        }
      }
    }
    spark.stop()
  }
}
