package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** CDC out (reference worker/cdc.go:44, sink_handler.go:50): emit triple
  * change events between two snapshots, and a writeStream wiring that
  * ships each micro-batch's delta to a sink.
  *
  * Event shape mirrors the reference's txn-log events: one row per
  * changed triple, op ∈ {set, delete}.
  */
object CdcSink {

  /** Snapshot diff → change events (op, subject, predicate, value).
    *
    * One full-outer join on the distinct'd key instead of two `except`s:
    * each `except` re-shuffled BOTH snapshots (four wide shuffles total),
    * while here each side shuffles once for its distinct and the join
    * reuses that partitioning — two shuffles, one pass per snapshot. At
    * 100 TB the snapshots are the whole store; halving the shuffled
    * volume is the difference between a diff job and a re-load.
    * Null-safe key equality (`<=>`) preserves `except`'s set semantics
    * where NULL values compare equal; subject is a uid and never null,
    * so a null side-marker identifies which snapshot is missing the row.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val key = Seq("subject", "predicate", "value")
    val o = oldSnap.select(key.map(col): _*).distinct().as("o")
    val n = newSnap.select(key.map(col): _*).distinct().as("n")
    val cond = key.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .filter(col("o.subject").isNull.or(col("n.subject").isNull))
      .select(key.map(c => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)) :+
        when(col("o.subject").isNull, lit("set")).otherwise(lit("delete")).as("op"): _*)
  }

  /** Stream triples to a file sink as JSON change records (kafka format
    * swaps `format("json")` for `format("kafka")` + topic options).
    */
  def start(triples: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    triples
      .select(to_json(struct(triples.columns.map(col): _*)).as("value"))
      .writeStream
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The full CDC pipeline over a STREAMING input of proposed mutations
    * (reference worker/cdc.go: the sink handler consumes the txn log as
    * it lands): each micro-batch runs `events` (typically snapshot-apply
    * + [[diff]]) and appends the change records to a parquet sink.
    * `Trigger.AvailableNow` drains everything already in the source and
    * stops — the batch-replayable form of a continuous tail; a live
    * deployment drops the trigger and keeps the same code path.
    *
    * Sink layout: one `batch=<id>` subdirectory per micro-batch (readers
    * see an extra `batch` partition column via discovery — select the
    * event columns explicitly). `outDir` must be fresh or already in
    * this layout; flat pre-existing parquet in the same directory fails
    * partition discovery.
    */
  def streamEvents(input: DataFrame, outDir: String, checkpointDir: String,
      sinkFormat: String = "file",
      kafkaOptions: Map[String, String] = Map.empty)
      (events: DataFrame => DataFrame): Unit = {
    // fail LOUDLY before the stream starts — a missing connector must
    // not surface as a ClassNotFoundException three batches in
    requireSinkAvailable(sinkFormat)
    val q = input.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(events(batch), batchId, outDir, sinkFormat, kafkaOptions)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch's events → the sink. BOTH branches share the same
    * idempotent batch-id contract (foreachBatch is at-least-once —
    * reference worker/sink_handler.go:50 consumers rely on redelivery
    * being a no-op): the file branch keys the WRITE by batch id and
    * overwrites, so a retry replaces identical bytes; the kafka branch
    * keys every RECORD by (batchId, event-hash), so a redelivered batch
    * produces byte-identical keys and consumers dedup on them — the
    * standard exactly-once recipe for each sink family.
    */
  private[graft] def writeBatch(evts: DataFrame, batchId: Long,
      outDir: String, sinkFormat: String,
      kafkaOptions: Map[String, String]): Unit = sinkFormat match {
    case "file" =>
      evts.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    case "kafka" =>
      kafkaRecords(evts, batchId).write.format("kafka")
        .options(kafkaOptions).save()
    case other =>
      throw new IllegalArgumentException(
        s"unknown CDC sink format: $other (supported: file, kafka)")
  }

  /** Kafka record frame for one batch: key = "batchId:md5(event)" —
    * deterministic across redeliveries, value = the JSON change event.
    * Pure projection (testable without the connector jar).
    */
  private[graft] def kafkaRecords(evts: DataFrame, batchId: Long): DataFrame =
    evts.select(
      concat_ws(":", lit(batchId),
        md5(to_json(struct(evts.columns.map(col): _*)))).as("key"),
      to_json(struct(evts.columns.map(col): _*)).as("value"))

  /** The kafka sink needs the spark-sql-kafka connector, which is NOT
    * part of the Spark distribution's default classpath.
    */
  private[graft] def kafkaConnectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private[graft] def requireSinkAvailable(sinkFormat: String): Unit =
    sinkFormat match {
      case "file" => ()
      case "kafka" =>
        if (!kafkaConnectorPresent) throw new IllegalStateException(
          "CDC kafka sink: the spark-sql-kafka connector is not on the " +
            "classpath. Deploy with --packages org.apache.spark:" +
            "spark-sql-kafka-0-10_2.13:<spark-version> (or add the jar " +
            "to spark.jars) and pass kafkaOptions including " +
            "kafka.bootstrap.servers and topic.")
      case other =>
        throw new IllegalArgumentException(
          s"unknown CDC sink format: $other (supported: file, kafka)")
    }
}
