package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch instrumentation main (builder tooling, not part of the
  * library surface): decomposes the shared SimHash signature-frame
  * first touch into component jobs.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val doc = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup read")(doc.count())
    val corpus = doc.select(col("doc_id").as("id"), col("text"))
      .unionByName(doc.filter(size(split(col("text"), " ")) > 5)
        .select((col("doc_id") + 1000000L).as("id"),
          concat_ws(" ", slice(split(col("text"), " "), lit(1),
            size(split(col("text"), " ")) - 3)).as("text")))
    time("corpus count")(corpus.count())
    val words = corpus.select(col("id"),
      explode(array_distinct(split(col("text"), " "))).as("w"))
    time("explode distinct words")(words.count())
    val hb = words.select(col("id"),
      conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    time("+md5+conv")(hb.agg(max(col("h"))).collect())
    val sums = Dedup2.bitSums(hb)
    time("20-packed agg")(sums.count())
    val sigs = sums.select(col("id"),
      graft.operators.Dedup.simhashSignature(16, 44).as("sim16"),
      graft.operators.Dedup.simhashSignature(60, 0).as("sim60"))
    time("sigs localCheckpoint") { sigs.localCheckpoint(); () }
    time("full pipeline again") {
      graft.operators.Dedup
        .simhashBitSums(corpus, col("id"), col("text"), 60)
        .select(col("id"),
          graft.operators.Dedup.simhashSignature(16, 44).as("sim16"),
          graft.operators.Dedup.simhashSignature(60, 0).as("sim60"))
        .localCheckpoint()
    }
    spark.stop()
  }
}

private object Dedup2 {
  import org.apache.spark.sql.Column
  def bitSums(hb: DataFrame): DataFrame = {
    val groups = 20
    val packed = (0 until groups).map { g =>
      (0 until 3).filter(j => g * 3 + j < 60).map(j =>
        (shiftright(col("h"), g * 3 + j) % 2) * lit(1L << (j * 20)))
        .reduce(_ + _)
    }
    val aggs = count(lit(1)).as("n") +:
      (0 until groups).map(g => sum(packed(g)).as(s"p$g"))
    hb.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }
}
