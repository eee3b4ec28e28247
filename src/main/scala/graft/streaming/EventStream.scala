package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming event processing. The reference has no stream
  * semantics beyond CDC-out (worker/cdc.go:44) — these are the windowed
  * operators a Spark-native engine adds on top (builder-prompt scope).
  *
  * Every transform below is *unified*: the same code runs on a batch
  * DataFrame (how the driver's oracle checks it) and on a streaming
  * DataFrame behind `readStream` (how production would run it, with the
  * watermark bounding state). Aggregates use exact decimal sums so
  * results are independent of micro-batch boundaries — a correctness
  * property, not just a determinism nicety: re-running the stream from a
  * checkpoint must produce identical windows.
  */
object EventStream {

  private val dec = DecimalType(18, 2)

  /** Tumbling windows per event_type: count + exact sum(value). */
  def tumbling(events: DataFrame, dur: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), dur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (dur, slide) per event_type. */
  def sliding(events: DataFrame, dur: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), dur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"))

  /** Gap-based session windows per user (session end = last event + gap). */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"),
        unix_millis(col("w.start")).as("start_ms"),
        unix_millis(col("w.end")).as("end_ms"))

  /** Stateful dedup analogue: first occurrence per (user_id, event_type). */
  def firstPerKey(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_millis(col("ts"))).as("first_ms"), count(lit(1)).as("n_dups"))

  /** Streaming exact dedup with EXPLICIT state
    * (flatMapGroupsWithState): keyed by content fingerprint; within a
    * micro-batch the smallest id wins (a min over the group iterator —
    * deterministic regardless of partitioning), across batches the
    * one-boolean-per-key state suppresses re-emissions. The streaming
    * face of the batch `Dedup.exact` — a training pipeline dedupes its
    * ingest continuously, not in one pass. State size is bounded by
    * distinct content, the same asymptotic as the batch hash-groupBy;
    * at 100 TB the key is a fingerprint (here md5), never the payload.
    * Works identically on a batch Dataset (how the oracle checks it).
    */
  def streamingDedup(rows: org.apache.spark.sql.Dataset[(String, Long)]):
      org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single((key, it.map(_._2).min)) }
      }
  }

  /** Streaming NEAR-dup detection: the stateful face of MinHash-LSH.
    * Input rows are (bandKey, docId) bucket entries (4 per doc from the
    * batch banding layer, [[graft.operators.Dedup.bucketsFromSets]]);
    * state is one boolean per band key. Within a micro-batch the
    * smallest id in a group is the band's first occurrence; across
    * batches the state marks the band as seen. A doc is a near-dup iff
    * ANY of its bands collides with an earlier doc — the per-band
    * verdicts emitted here are OR-folded per doc after the drain.
    * State size is |distinct band keys| booleans ≈ corpus size × bands,
    * the same asymptotic as the batch LSH shuffle — and the key is a
    * 32-hex band hash, never the payload.
    */
  def streamingBandDedup(rows: org.apache.spark.sql.Dataset[(String, Long)]):
      org.apache.spark.sql.Dataset[(Long, Boolean)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          val ids = it.map(_._2).toArray.sorted
          if (state.exists) ids.iterator.map(id => (id, true))
          else {
            state.update(true)
            ids.iterator.zipWithIndex.map { case (id, i) => (id, i > 0) }
          }
      }
  }

  /** Wire a transform over a streaming source and drain it synchronously
    * into a memory sink (local smoke path; production swaps the source
    * for kafka/delta and the sink for a real writer + checkpoint).
    */
  def runMicroBatch(spark: SparkSession, sourceDir: String,
      transform: DataFrame => DataFrame, queryName: String): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = transform(stream.withWatermark("ts", "1 hour"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
