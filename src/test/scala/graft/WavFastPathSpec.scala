package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The r17 decodeAudio fast path parses canonical PCM RIFF/WAVE blobs
  * directly instead of routing every blob through AudioSystem's
  * provider registry. This pins the equivalence the optimization rests
  * on: for every blob the synthesizer produces, the direct parse must
  * read EXACTLY what AudioSystem reads — format fields and the PCM
  * payload byte-for-byte — and anything that is not plain PCM WAV must
  * fall back (None).
  */
final class WavFastPathSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def synthBlobs(n: Int): Seq[Array[Byte]] = {
    import spark.implicits._
    val pat = spark.range(n).selectExpr("id AS media_id",
      "CAST((id + 3) * 2863311530 + 12345 AS BIGINT) AS bits")
    Multimodal.synthesizeToneWav(pat).select(col("blob"))
      .collect().map(_.getAs[Array[Byte]](0)).toSeq
  }

  test("direct PCM parse == AudioSystem on every synthesized WAV") {
    val blobs = synthBlobs(8)
    assert(blobs.nonEmpty)
    for (b <- blobs) {
      val parsed = Multimodal.parsePcmWav(b)
      assert(parsed.isDefined, "synthesized WAV must take the fast path")
      val (rate, ch, bits, dOff, dLen) = parsed.get
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      val f = in.getFormat
      assert(rate == f.getSampleRate.toInt)
      assert(ch == f.getChannels)
      assert(bits == f.getSampleSizeInBits)
      assert(!f.isBigEndian, "canonical WAV payload is little-endian")
      assert(dLen.toLong / (bits / 8 * ch) == in.getFrameLength,
        "frame count must match AudioSystem's")
      val ref = in.readAllBytes()
      val fast = java.util.Arrays.copyOfRange(b, dOff, dOff + dLen)
      assert(java.util.Arrays.equals(fast, ref),
        "PCM payload must be byte-identical to AudioSystem's stream")
    }
  }

  test("non-WAV and truncated blobs fall back (None)") {
    assert(Multimodal.parsePcmWav("not a riff file at all".getBytes).isEmpty)
    assert(Multimodal.parsePcmWav(Array.emptyByteArray).isEmpty)
    val wav = synthBlobs(1).head
    // truncate inside the data chunk: the declared chunk size then
    // overruns the buffer and the parser must refuse, not mis-slice
    assert(Multimodal.parsePcmWav(wav.take(60)).isEmpty)
    // flip the fmt tag to a non-PCM codec id
    val nonPcm = wav.clone()
    nonPcm(20) = 7 // mu-law
    assert(Multimodal.parsePcmWav(nonPcm).isEmpty)
  }

  test("decodeAudio over synthesized blobs yields identical rows either way") {
    import spark.implicits._
    val pat = spark.range(6).selectExpr("id AS media_id",
      "CAST(-6148914691236517206 + id AS BIGINT) AS bits") // 0xAAAA… pattern
    val blobs = Multimodal.synthesizeToneWav(pat)
    val out = Multimodal.decodeAudio(blobs)
      .orderBy(col("media_id")).collect()
    assert(out.length == 6)
    // every row decoded through the fast path (no NULL metadata) with
    // the synthesizer's declared format
    for (r <- out) {
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1)
      assert(r.getLong(3) == 64L * 125)
      assert(r.getLong(4) == 1000L)
      assert(r.get(5) != null && r.getLong(6) != 0L)
    }
  }
}
