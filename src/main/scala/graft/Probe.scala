package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch instrumentation main (builder tooling, not part of the
  * library surface): breaks dedup_simhash_pairs into component jobs.
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
    val ws = split(col("text"), " ")
    val corpus = doc.select(col("doc_id").as("id"), col("text"))
      .unionByName(doc.filter(size(ws) > 5)
        .select((col("doc_id") + 1000000L).as("id"),
          concat_ws(" ", slice(ws, lit(1), size(ws) - 3)).as("text")))
    time("corpus count")(corpus.count())
    // stage 1: explode distinct words
    val hb = corpus.select(col("id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    time("explode words count")(hb.count())
    // stage 2: md5 + conv
    val h = hb.select(col("id"),
      conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    time("md5+conv agg")(h.agg(max(col("h"))).collect())
    // stage 3: 60 bit-sums
    val bitSums = (0 until 60).map(b =>
      sum((shiftright(col("h"), b) % 2) * 2 - 1).as(s"b$b"))
    val grouped = h.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    time("60-sum groupBy")(grouped.count())
    val assembled = (0 until 60).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val sig = grouped.select(col("id"), assembled.as("simhash"))
    time("assemble sigs")(sig.count())
    var sh: DataFrame = null
    time("localCheckpoint") { sh = sig.localCheckpoint() }
    // stage 4: banding join
    time("hashPairs full")(
      graft.operators.Dedup.hashPairs(sh, 60, 4).count())
    time("hashPairs again")(
      graft.operators.Dedup.hashPairs(sh, 60, 4).count())
    // bucket population: how many rows land in the join per block?
    val nBlocks = 5; val width = 12
    def blockOf(sig: org.apache.spark.sql.Column, i: Int) = {
      val lo = i * width
      shiftright(sig, lo) % (1L << (if (i == nBlocks - 1) 60 - lo else width))
    }
    val buckets = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until nBlocks).map(blockOf(col("simhash"), _)): _*))
        .as(Seq("blk", "key")))
    time("bucket pop") {
      buckets.groupBy(col("blk"), col("key")).count()
        .groupBy(col("blk")).agg(sum(col("count") * col("count")).as("sq"),
          max(col("count")).as("mx"), count(lit(1)).as("nbuckets"))
        .orderBy(col("blk")).show()
    }
    graft.operators.Dedup.hashPairs(sh, 60, 4).explain()
    time("distinct sigs")(println("ndistinct=" +
      sh.select(col("simhash")).distinct().count() + " of " + sh.count()))
    time("result pairs")(println("npairs=" +
      graft.operators.Dedup.hashPairs(sh, 60, 4).count()))
    // end-to-end comparison
    time("simhashPairs e2e")(
      graft.operators.Dedup.simhashPairs(corpus, col("id"), col("text"), 4).count())
    spark.stop()
  }
}
