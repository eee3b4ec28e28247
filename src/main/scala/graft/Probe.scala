package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch instrumentation main (builder tooling, not part of the
  * library surface): breaks dedup_ngram_jaccard into component jobs.
  */
object Probe {
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
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val doc = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup read")(doc.count())
    import graft.functions.TextFunctions._
    def nearSets: DataFrame = {
      val base = doc.select(col("doc_id").as("id"),
        split(col("text"), " ").as("ws"))
        .select(col("id"), size(col("ws")).as("n"),
          shingles(col("ws"), 3).as("sh"))
      base.select(col("id"), array_distinct(col("sh")).as("sh"))
        .unionByName(base.filter(col("n") > 5)
          .select((col("id") + 1000000L).as("id"),
            array_distinct(slice(col("sh"), lit(1), size(col("sh")) - 3)).as("sh")))
    }
    var mat: DataFrame = null
    time("nearSets localCheckpoint") { mat = nearSets.localCheckpoint() }
    var cand: DataFrame = null
    time("candidates from mat") {
      cand = graft.operators.Dedup.candidatesFromSets(mat).localCheckpoint()
    }
    time("cand count")(println("npairs=" + cand.count()))
    // variant: pre-hash shingles into the checkpoint (transform HOF md5)
    var mat2: DataFrame = null
    time("nearSets+hs ckpt") {
      mat2 = nearSets.withColumn("hs",
        transform(col("sh"),
          x => conv(substring(md5(x), 1, 7), 16, 10).cast("long")))
        .localCheckpoint()
    }
    // signatures from the pre-hashed array: explode longs, 8 affine mins
    time("sigs from hs") {
      val sh = mat2.select(col("id"), explode(col("hs")).as("h"))
      val sigCols = (0 until 8).map(i =>
        min((col("h") * graft.operators.Dedup.minhashA(i) +
          graft.operators.Dedup.minhashB(i)) % graft.operators.Dedup.MinhashM).as(s"s$i"))
      sh.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*).count()
    }
    time("jaccard from mat") {
      graft.operators.Dedup.jaccardFromSets(mat, cand.select(col("a"), col("b"))).count()
    }
    time("jaccard again") {
      graft.operators.Dedup.jaccardFromSets(mat, cand.select(col("a"), col("b"))).count()
    }
    spark.stop()
  }
}
