package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation main (builder tooling, not part of the
  * library surface): decomposes the stream_dedup gate into phases.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "100")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftOptimizations.install(spark)
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val keyed = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(md5(col("text")).as("key"), col("doc_id").cast("long").as("id"))
    time("keyed count")(keyed.count())
    val base = "target/probe_streamdedup_" + System.nanoTime()
    time("write inputs") {
      keyed.coalesce(1).write.mode("overwrite").parquet(s"$base/in")
      keyed.withColumn("id", col("id") + 1000000L)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    }
    time("stream run") {
      val in = spark.readStream.schema(keyed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      val q = graft.streaming.EventStream.streamingDedup(in.as[(String, Long)])
        .toDF("key", "first_id")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    time("read out")(println("rows=" +
      spark.read.parquet(s"$base/out").count()))
    // second full run to separate JIT/class-load from steady cost
    Seq(("32p", "32"), ("8p", "8"), ("8p again", "8")).foreach { case (tag, parts) =>
      val base2 = base + "_" + tag.replace(" ", "")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"write inputs $tag") {
        keyed.coalesce(1).write.mode("overwrite").parquet(s"$base2/in")
        keyed.withColumn("id", col("id") + 1000000L)
          .coalesce(1).write.mode("append").parquet(s"$base2/in")
      }
      time(s"stream run $tag") {
        val in = spark.readStream.schema(keyed.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base2/in")
        val q = graft.streaming.EventStream.streamingDedup(in.as[(String, Long)])
          .toDF("key", "first_id")
          .writeStream.format("parquet")
          .option("path", s"$base2/out")
          .option("checkpointLocation", s"$base2/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.stop()
  }
}
