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

  /** Snapshot diff → change events (op, subject, predicate, value). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val key = Seq("subject", "predicate", "value")
    val sets = newSnap.select(key.map(col): _*).except(oldSnap.select(key.map(col): _*))
      .withColumn("op", lit("set"))
    val dels = oldSnap.select(key.map(col): _*).except(newSnap.select(key.map(col): _*))
      .withColumn("op", lit("delete"))
    sets.unionByName(dels)
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
}
