package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Multimodal
import graft.streaming.{CdcSink, EventStream}

/** Real Structured Streaming micro-batch runs (memory sink) + CDC diff +
  * multimodal decode plumbing.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("streaming tumbling agg over readStream equals batch result") {
    // stage the events parquet into a stream-source dir
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.load(spark, sf, "events").write.mode("overwrite").parquet(dir)
    val streamed = EventStream.runMicroBatch(spark, dir,
      df => EventStream.tumbling(df), "tumbling_smoke")
    val batch = EventStream.tumbling(Tables.load(spark, sf, "events"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("CdcSink.diff emits set/delete triple deltas") {
    val oldSnap = Seq((1L, "name", "a"), (2L, "name", "b"))
      .toDF("subject", "predicate", "value")
    val newSnap = Seq((1L, "name", "a"), (2L, "name", "B"), (3L, "name", "c"))
      .toDF("subject", "predicate", "value")
    val d = CdcSink.diff(oldSnap, newSnap)
      .as[(Long, String, String, String)].collect().toSet
    assert(d == Set((2L, "name", "B", "set"), (3L, "name", "c", "set"),
      (2L, "name", "b", "delete")))
  }

  test("multimodal decode stub: schema, determinism, frame sampling") {
    val media = Seq((1L, Array[Byte](10, 20, 3, 40, 50)), (2L, Array[Byte]()))
      .toDF("media_id", "blob")
    val out = Multimodal.decodeStub(media)
    assert(out.schema == Multimodal.outputSchema)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 64 + 10 && rows(0).getInt(2) == 64 + 20)
    assert(rows(0).getSeq[Float](4).length == Multimodal.featureDim)
    // determinism: run twice, same features
    val again = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](4) == again(0).getSeq[Float](4))
    val sampled = Multimodal.sampleFrames(out, 2)
      .filter($"media_id" === 1).select("sampled_frames").head.getSeq[Int](0)
    assert(sampled.forall(_ % 2 == 0))
  }
}
