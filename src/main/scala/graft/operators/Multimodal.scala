package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque BINARY
  * columns with typed metadata; decode / feature-extract run as
  * batch-shaped partition functions (the Scala analogue of
  * `mapInPandas`: one iterator per partition, vectorizable per batch).
  *
  * The actual media decode is STUBBED — image/audio libraries are not in
  * this container. `decodeStub` produces deterministic fake features from
  * the bytes; the Spark-side plumbing (schema, partitioning, batch
  * iterator shape) is real and tested (MultimodalSpec). A production
  * deployment swaps `fakeDecode` for the real codec call, nothing else
  * changes.
  */
object Multimodal {

  val featureDim = 8

  val outputSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB for the real decoder. Deterministic: features are byte
    * averages over `featureDim` strides; metadata from header bytes.
    * Real impl would be e.g. `ImageIO.read(new ByteArrayInputStream(b))`.
    */
  private def fakeDecode(b: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val w = 64 + (b.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 64 + (b.lift(1).getOrElse(0: Byte) & 0x3f)
    val frames = 1 + (b.lift(2).getOrElse(0: Byte) & 0x07)
    val feats = Array.tabulate(featureDim) { i =>
      val slice = b.drop(i).sliding(1, featureDim).flatten.toArray
      if (slice.isEmpty) 0f else slice.map(_.toInt & 0xff).sum.toFloat / slice.length
    }
    (w, h, frames, feats)
  }

  /** Decode a (media_id LONG, blob BINARY) frame into metadata+features.
    * Runs as mapPartitions: per-partition batch iterator, no shuffle,
    * schema declared up front — the exact shape a Pandas-UDF/Arrow batch
    * pipeline has at 100 TB.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, f, feats) = fakeDecode(r.getAs[Array[Byte]]("blob"))
          Row(r.getLong(0), w, h, f, feats)
        }
      }
    spark.createDataFrame(rdd, outputSchema)
  }

  /** Frame sampling: keep every k-th frame index per media (pure column
    * ops; the heavy decode happens only for sampled frames downstream).
    */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      filter(sequence(lit(0), col("n_frames") - 1),
        i => i % everyK === 0).as("sampled_frames"))
}
