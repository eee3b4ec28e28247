package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (reference similar_to,
  * worker/task.go:267; HNSW index tok/hnsw/persistent_hnsw.go).
  *
  * Spark-first design: HNSW's pointer-chasing graph walk doesn't
  * distribute, so the scale path is partition-pruned brute force:
  *  - `bruteForceTopK`: query-set × corpus join, ranked per query.
  *    The corpus side streams through whole-stage codegen; the (small)
  *    query side is broadcast, so there is NO shuffle of the corpus —
  *    only the per-query top-k aggregation shuffles k rows per query.
  *  - `ivfTopK`: IVF-style — restrict candidates to the query's coarse
  *    cell (here: the `label` column as the quantizer cell id),
  *    cutting compared pairs by the cell count. Real deployments would
  *    k-means the corpus to build cells; the join/ranking shape is
  *    identical.
  *
  * Quantized (`cosineQ`) scoring keeps rankings bit-reproducible across
  * runs and engines (see VectorFunctions).
  */
object Similarity {

  /** Top-k neighbors per query by quantized cosine.
    * queries/corpus: (id, qe) with pre-quantized vectors.
    * Returns (qid, nid, sim, rank), self-pairs excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    broadcast(queries.select(col("id").as("qid"), col("qe").as("qv")))
      .join(corpus.select(col("id").as("nid"), col("qe").as("nv")),
        col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineQ(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("qv", "nv")
  }

  /** IVF-style top-k: candidates restricted to the query's cell. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    broadcast(queries.select(col("id").as("qid"), col("cell").as("qcell"), col("qe").as("qv")))
      .join(corpus.select(col("id").as("nid"), col("cell"), col("qe").as("nv")),
        col("qcell") === col("cell") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineQ(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Near-duplicate pairs: same cell, quantized cosine above threshold. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val l = corpus.select(col("id").as("a"), col("cell"), col("qe").as("av"))
    val r = corpus.select(col("id").as("b"), col("cell"), col("qe").as("bv"))
    l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosineQ(col("av"), col("bv")).as("sim"))
      .filter(col("sim") > threshold)
  }
}
