package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation main (builder tooling, not part of the
  * library surface): breaks backup_restore into its component jobs.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // internal flat-column names collide under case-insensitive
      // resolution (aliased `friend_Friend` vs nested `friend_friend`)
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime()
      fn
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val ts = graft.core.TripleStore(spark, sfDir)
    time("line warmup")(ts.attr("quantity").count())
    val frame = graft.operators.Backup.tripleFrame(ts)
    time("tripleFrame count")(frame.count())
    time("tripleFrame count again")(frame.count())
    val dir = new java.io.File("target/probe-backup").getAbsolutePath
    time("full() write")(graft.operators.Backup.full(ts, dir))
    time("restore+query") {
      graft.operators.Backup.restore(spark, dir, ts.facetKeys)
        .attr("name")
        .select(col("subject"), col("value")).orderBy(col("subject")).count()
    }
    time("full() write again")(graft.operators.Backup.full(ts, dir))
    // codec / layout experiments on the same frame
    val f = graft.operators.Backup.tripleFrame(ts)
    time("write snappy+partitionBy") {
      f.write.mode("overwrite").partitionBy("predicate")
        .parquet("target/probe-b1")
    }
    time("write none+partitionBy") {
      f.write.mode("overwrite").option("compression", "none")
        .partitionBy("predicate").parquet("target/probe-b2")
    }
    time("write lz4+partitionBy") {
      f.write.mode("overwrite").option("compression", "lz4")
        .partitionBy("predicate").parquet("target/probe-b3")
    }
    time("write snappy flat") {
      f.write.mode("overwrite").parquet("target/probe-b4")
    }
    time("full() to FRESH dir") {
      graft.operators.Backup.full(ts, "target/probe-fresh1")
    }
    time("frame write to EXISTING") {
      f.write.mode("overwrite").partitionBy("predicate")
        .parquet("target/probe-b1")
    }
    time("full() to fresh again") {
      graft.operators.Backup.full(ts, "target/probe-fresh2")
    }
    spark.stop()
  }
}
