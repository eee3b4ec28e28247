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

  test("watermark drops late rows in Append mode; windows finalize once the watermark passes") {
    // the 100 TB state-boundedness claim made concrete: a 10-minute
    // watermark lets the tumbling state evict; a row arriving behind the
    // watermark is DROPPED, not retro-aggregated
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(min: Int) = new java.sql.Timestamp(3600L * 1000 * 24 + min * 60000L)
    val windowed = EventStream.tumbling(
      src.toDS().toDF("ts", "event_type", "value")
        .withWatermark("ts", "10 minutes"))
    val q = windowed.writeStream.format("memory").queryName("wm_tumbling")
      .outputMode(OutputMode.Append).start()
    // batch 1: two rows in window [0,5) and one at minute 30 that will
    // push the watermark to 20 once processed
    src.addData((ts(1), "c", 1.0), (ts(2), "c", 2.0), (ts(30), "c", 9.0))
    q.processAllAvailable()
    // batch 2: a LATE row for the [0,5) window — behind the watermark
    src.addData((ts(3), "c", 100.0))
    q.processAllAvailable()
    // batch 3: advance far enough to flush remaining windows
    src.addData((ts(60), "c", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_tumbling")
      .select($"window_start_ms", $"n", $"sum_value")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the [0,5) window finalized from batch 1 ONLY: n=2, sum=3 — the
    // late 100.0 never entered it
    assert(out(ts(0).getTime) == ((2L, 3.0)))
    assert(out(ts(30).getTime) == ((1L, 9.0)))
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

  test("CDC sink idempotence: batch-id-keyed writes make retries and re-drains duplicate-free") {
    // the reference's CDC contract (worker/sink_handler.go:50): the sink
    // handler may deliver a batch more than once (at-least-once), and
    // consumers rely on redelivery being a no-op. Our recipe keys every
    // foreachBatch write by its batch id and overwrites — assert the two
    // redelivery shapes a real deployment hits:
    val base = java.nio.file.Files.createTempDirectory("graft_cdc_idem").toString
    val muts = Seq((1L, "name", "a"), (2L, "name", "b"), (3L, "name", "c"))
      .toDF("subject", "predicate", "value")
    muts.repartition(2, $"subject").write.mode("overwrite").parquet(s"$base/in")
    def drain(): Unit = {
      val in = spark.readStream.schema(muts.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      CdcSink.streamEvents(in, s"$base/out", s"$base/ckpt")(b =>
        b.withColumn("op", lit("set")))
    }
    drain()
    def sink() = spark.read.parquet(s"$base/out")
      .select($"subject", $"predicate", $"value", $"op")
      .as[(Long, String, String, String)].collect().sorted.toSeq
    val first = sink()
    assert(first.map(_._1) == Seq(1L, 2L, 3L))
    // shape 1: a RETRIED micro-batch (foreachBatch re-runs after a
    // failure with the same batch id) — replay batch 0's write verbatim.
    // Materialize the rows first: a retry recomputes the events from the
    // source, it doesn't read-then-rewrite the sink it's overwriting.
    val batch0 = spark.read.parquet(s"$base/out/batch=0").localCheckpoint()
    batch0.write.mode("overwrite").parquet(s"$base/out/batch=0")
    assert(sink() == first, "retried batch write must be a no-op")
    // shape 2: a sink RE-DRAIN (restart from the same checkpoint with no
    // new input) — the checkpoint replays nothing, the sink is unchanged
    drain()
    assert(sink() == first, "checkpoint re-drain must add no events")
  }

  test("CDC kafka branch shares the batch-id idempotence contract and fails loudly without the connector") {
    val evts = Seq((1L, "name", "a", "set"), (2L, "name", "b", "set"))
      .toDF("subject", "predicate", "value", "op")
    // records are keyed (batchId, event-hash): redelivering the SAME
    // batch produces byte-identical keys (consumer dedup = no-op, the
    // same contract the file branch meets by overwriting batch=<id>),
    // while a different batch id never collides
    val r1 = CdcSink.kafkaRecords(evts, 7L)
      .as[(String, String)].collect().sorted.toSeq
    val r2 = CdcSink.kafkaRecords(evts, 7L)
      .as[(String, String)].collect().sorted.toSeq
    assert(r1 == r2, "redelivered batch must produce identical records")
    assert(r1.forall(_._1.startsWith("7:")))
    val other = CdcSink.kafkaRecords(evts, 8L)
      .as[(String, String)].collect().map(_._1).toSet
    assert(r1.map(_._1).toSet.intersect(other).isEmpty)
    assert(r1.head._2.contains("\"subject\""))
    // the connector jar is absent from this build: selecting the kafka
    // sink must fail BEFORE the stream starts, with the deployment
    // instruction — not a ClassNotFoundException mid-stream
    assert(!CdcSink.kafkaConnectorPresent)
    val e = intercept[IllegalStateException] {
      CdcSink.requireSinkAvailable("kafka")
    }
    assert(e.getMessage.contains("spark-sql-kafka-0-10_2.13"), e.getMessage)
    assert(e.getMessage.contains("kafka.bootstrap.servers"), e.getMessage)
    // and an unknown format is rejected outright
    intercept[IllegalArgumentException] {
      CdcSink.requireSinkAvailable("pulsar")
    }
    // file stays available
    CdcSink.requireSinkAvailable("file")
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

  test("real image decode: ImageIO round-trip, perceptual hashes, resize, corrupt fallback") {
    // synthesize real PNGs (JDK writer) → decode (JDK reader)
    val dims = Seq((1L, 20, 17), (2L, 16, 16)).toDF("media_id", "w", "h")
    val pngs = Multimodal.synthesizePng(dims)
    val out = Multimodal.decodeImage(pngs).orderBy("media_id").collect()
    assert(out(0).getString(1) == "png" &&
      out(0).getInt(2) == 20 && out(0).getInt(3) == 17)
    // aHash determinism + self-similarity: identical content → equal
    // hashes; different gradient phase → different
    val again = Multimodal.decodeImage(pngs).orderBy("media_id").collect()
    assert(out(0).getLong(5) == again(0).getLong(5))
    // near-dup detection: one-pixel perturbation keeps hamming small
    def img(w: Int, h: Int, tweak: Boolean): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 11 + y * 5) % 256
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (tweak) b.setRGB(0, 0, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    val trio = Seq((10L, img(64, 64, tweak = false)),
      (11L, img(64, 64, tweak = true))).toDF("media_id", "blob")
    val hs = Multimodal.decodeImage(trio).orderBy("media_id")
      .select("ahash").as[Long].collect()
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) <= 4)
    // resize re-encodes at the target dims and stays decodable
    val rs = Multimodal.decodeImage(
      Multimodal.resizeImages(pngs, 8, 8)).orderBy("media_id").collect()
    assert(rs.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    // corrupt bytes: NULL format, stub metadata, no exception
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "blob")
    val j = Multimodal.decodeImage(junk).collect().head
    assert(j.isNullAt(1) && !j.isNullAt(2))
  }

  test("image near-dup: synthesized bitmaps round-trip aHash exactly, banding finds intra-group pairs") {
    // three groups of two: members flip one low bit of a shared base
    // pattern → intra-group hamming 2; cross-group patterns differ in
    // the high bits → far apart
    val base = Seq(0x00F0F0F0F0F0F010L, 0x0F0F0F0F0F0F0F00L, 0x5555AAAA5555AA00L)
    val pats = (for (g <- 0 until 3; m <- 0 until 2)
      yield ((g * 2 + m).toLong, base(g) | (1L << m))).toDF("media_id", "bits")
    val decoded = Multimodal.decodeImage(Multimodal.synthesizeBitmapPng(pats))
    // real codec round-trip: decoded aHash == requested pattern, bit-exact
    val got = decoded.orderBy("media_id").select("media_id", "ahash")
      .as[(Long, Long)].collect().toMap
    for (g <- 0 until 3; m <- 0 until 2)
      assert(got((g * 2 + m).toLong) == (base(g) | (1L << m)),
        s"aHash mismatch for g=$g m=$m")
    // pigeonhole banding over the recovered hashes: exactly the three
    // intra-group pairs, each at distance 2
    val pairs = graft.operators.Dedup.imageNearDupPairs(decoded, maxDist = 2)
      .orderBy("a").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 2), (2L, 3L, 2), (4L, 5L, 2)))
  }

  test("video decode: animated GIF per-frame aHash round-trip, sampling + keyframe near-dup compose") {
    val pats = Seq(
      (0L, Seq(0x00F0F0F0F0F0F010L, 0x0F0F0F0F0F0F0F00L)),
      (1L, Seq(0x00F0F0F0F0F0F013L)), // keyframe within hamming 2 of 0's
      (2L, Seq(0x5555AAAA5555AA00L, 0x00000000000000FFL, 0x0F0F0F0F0F0F0F00L))
    ).toDF("media_id", "frame_bits")
    val dec = Multimodal.decodeVideo(Multimodal.synthesizeAnimatedGif(pats))
      .localCheckpoint()
    val rows = dec.orderBy("media_id").collect()
    assert(rows(0).getString(1) == "gif" && rows(0).getInt(2) == 32)
    assert(rows.map(_.getInt(4)).toSeq == Seq(2, 1, 3))
    // every frame's pattern recovered bit-exactly through the GIF codec
    assert(rows(0).getSeq[Long](5) == Seq(0x00F0F0F0F0F0F010L, 0x0F0F0F0F0F0F0F00L))
    assert(rows(2).getSeq[Long](5)(1) == 0x00000000000000FFL)
    // keyframe banding finds exactly the (0, 1) pair at keyframe
    // distance 2, and the frame-sequence verification (mean per-frame
    // hamming over the aligned prefix) confirms it: video 1 has one
    // frame, so the mean is that keyframe distance
    val pairs = graft.operators.Dedup.videoNearDupPairs(dec, maxDist = 2)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(pairs == Seq((0L, 1L, 2, 2.0)))
    // frame sampling runs over the REAL decoded frame counts
    val sampled = Multimodal.sampleFrames(dec, everyK = 2)
      .orderBy("media_id").select("sampled_frames").as[Seq[Int]].collect()
    assert(sampled.toSeq == Seq(Seq(0), Seq(0), Seq(0, 2)))
  }

  test("video verify fold runs on banding candidates only — cardinality stays far below all-pairs") {
    // institutionalizes the scale guard on videoNearDupPairs' verify
    // fold (a CodegenFallback HOF): its input is hashPairs' banding
    // OUTPUT, never the corpus cross product. 64 spread-out keyframes +
    // 3 planted near-pairs → all-pairs is 2,211; candidates must stay
    // within the planted handful.
    val base = (0 until 64).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
    val planted = Seq((100L, base(3)._2 ^ 1L), (101L, base(17)._2 ^ 3L),
      (102L, base(40)._2 ^ 1L))
    val corpus = (base ++ planted).toDF("id", "simhash")
    val cands = graft.operators.Dedup.hashPairs(corpus, 64, maxDist = 2)
    val nCand = cands.count()
    val n = 67L
    assert(nCand >= 3, s"planted near-pairs not found: $nCand")
    assert(nCand <= 12, s"banding produced $nCand candidates — the " +
      s"interpreted verify fold would run near all-pairs (${n * (n - 1) / 2})")
  }

  test("real audio decode: WAV via AudioSystem, metadata + energy features") {
    // synthesize a 16-bit mono WAV (JDK encoder): 0.1s of a square wave
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v: Int = if ((i / 20) % 2 == 0) 12000 else -12000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq((1L, bos.toByteArray)).toDF("media_id", "blob")
    val r = Multimodal.decodeAudio(media).collect().head
    assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getLong(3) == n)
    assert(r.getLong(4) == 100) // 800 frames @ 8 kHz = 100 ms
    val feats = r.getSeq[Float](5)
    assert(feats.length == Multimodal.featureDim &&
      feats.forall(f => f > 10000 && f < 13000))
    // junk → NULL metadata, no exception
    val junk = Seq((2L, Array[Byte](9, 9, 9))).toDF("media_id", "blob")
    assert(Multimodal.decodeAudio(junk).collect().head.isNullAt(1))
  }

  test("streamingDedup: cross-batch state suppresses re-emissions, intra-batch min wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = EventStream.streamingDedup(src.toDS())
      .toDF("key", "first_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    // batch 1: k1 twice (min 5 wins), k2 once
    src.addData(("k1", 7L), ("k1", 5L), ("k2", 9L))
    q.processAllAvailable()
    // batch 2: k1 again (suppressed by state), k3 new
    src.addData(("k1", 1L), ("k3", 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup").as[(String, Long)].collect().toSet
    assert(got == Set(("k1", 5L), ("k2", 9L), ("k3", 2L)))
    // batch-mode face: same transform on a batch Dataset = min per key
    val batch = EventStream.streamingDedup(
      Seq(("a", 3L), ("a", 1L), ("b", 4L)).toDS()).collect().toSet
    assert(batch == Set(("a", 1L), ("b", 4L)))
  }

  test("streamingBandDedup: any-band collision marks a near-dup, per-band verdicts OR-fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = EventStream.streamingBandDedup(src.toDS())
      .toDF("id", "dup")
      .writeStream.format("memory").queryName("sband")
      .outputMode(OutputMode.Append).start()
    // batch 1: doc 1 owns bands A,B; doc 2 shares B (collides) + owns C
    src.addData(("A", 1L), ("B", 1L), ("B", 2L), ("C", 2L))
    q.processAllAvailable()
    // batch 2: doc 3 hits the stateful band A; doc 4 is all-fresh
    src.addData(("A", 3L), ("D", 3L), ("E", 4L), ("F", 4L))
    q.processAllAvailable()
    q.stop()
    val verdicts = spark.table("sband").as[(Long, Boolean)].collect()
      .groupBy(_._1).map { case (id, vs) => id -> !vs.exists(_._2) }
    // doc 1 new (first on both bands); doc 2 dup (B collided even
    // though C was fresh); doc 3 dup (A held state); doc 4 new
    assert(verdicts == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("audio near-dup: synthesized tones round-trip ehash exactly, banding finds intra-group pairs") {
    val base = Seq(0x00F0F0F0F0F0F010L, 0x0F0F0F0F0F0F0F00L, 0x5555AAAA5555AA00L)
    val pats = (for (g <- 0 until 3; m <- 0 until 2)
      yield ((g * 2 + m).toLong, base(g) | (1L << m))).toDF("media_id", "bits")
    val decoded = Multimodal.decodeAudio(Multimodal.synthesizeToneWav(pats))
    // real WAV codec round-trip: decoded ehash == requested pattern
    val got = decoded.orderBy("media_id").select("media_id", "ehash")
      .as[(Long, Long)].collect().toMap
    for (g <- 0 until 3; m <- 0 until 2)
      assert(got((g * 2 + m).toLong) == (base(g) | (1L << m)),
        s"ehash mismatch for g=$g m=$m")
    val pairs = graft.operators.Dedup.audioNearDupPairs(decoded, maxDist = 2)
      .orderBy("a").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 2), (2L, 3L, 2), (4L, 5L, 2)))
  }
}
