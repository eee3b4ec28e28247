package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (reference similar_to,
  * worker/task.go:267; HNSW index tok/hnsw/persistent_hnsw.go).
  *
  * Spark-first design: HNSW's pointer-chasing graph walk doesn't
  * distribute, so the scale path is partition-pruned brute force:
  *  - `bruteForceTopK`: query-set × corpus join, ranked per query.
  *    The corpus side streams through codegen; the (small) query side is
  *    broadcast, so there is NO shuffle of the corpus — and the per-query
  *    ranking is a bounded-heap aggregate (plans/TopKPairs) whose
  *    map-side partial combine bounds the shuffle at k rows per
  *    (query, input partition), never the full scored cross product.
  *  - `ivfTopK`: IVF-style — restrict candidates to the query's coarse
  *    cell (here: the `label` column as the quantizer cell id).
  *
  * Squared norms are computed once per row *before* the pair join (an
  * O(n) pass instead of O(n²) recomputation); only the dot product runs
  * per pair. Quantized (`cosineQ`-equivalent) scoring keeps rankings
  * bit-reproducible across runs and engines.
  */
object Similarity {

  /** (qid, nid, sim) scored pairs → (qid, nid, sim, rank) keeping the k
    * best per query, score desc / nid asc — via the bounded-heap
    * aggregate, not a window over all pairs.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("qid"))
      .agg(graft.plans.TopKPairs.topk(col("sim"), col("nid"), k).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.nid").as("nid"), col("col.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))

  /** cosine from a per-pair dot and prejoined squared norms — identical
    * arithmetic to VectorFunctions.cosineQ (exact ints, one double op
    * chain), just with the norms hoisted out of the join.
    */
  private def cosFromParts(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("__nrm", normQ(col("qe")))

  /** Top-k neighbors per query by quantized cosine.
    * queries/corpus: (id, qe) with pre-quantized vectors.
    * Returns (qid, nid, sim, rank), self-pairs excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(col("id").as("qid"), col("qe").as("qv"), col("__nrm").as("qn"))
    val c = withNorm(corpus).select(col("id").as("nid"), col("qe").as("nv"), col("__nrm").as("nn"))
    rankTopK(broadcast(q).join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosFromParts(dotQ(col("qv"), col("nv")), col("qn"), col("nn")).as("sim")), k)
  }

  /** IVF-style top-k: candidates restricted to the query's cell. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries).select(col("id").as("qid"), col("cell").as("qcell"),
      col("qe").as("qv"), col("__nrm").as("qn"))
    val c = withNorm(corpus).select(col("id").as("nid"), col("cell"),
      col("qe").as("nv"), col("__nrm").as("nn"))
    rankTopK(broadcast(q).join(c, col("qcell") === col("cell") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosFromParts(dotQ(col("qv"), col("nv")), col("qn"), col("nn")).as("sim")), k)
  }

  /** Random-hyperplane LSH signature: bit j of `sig` is the sign of the
    * dot product with plane j. Planes are deterministic ±1 vectors derived
    * from md5(plane:dim) — metadata-sized, computed driver-side, shipped
    * as literals (no data movement). At 100 TB the signature is a per-row
    * projection; the ANN join shuffles only on the small sig space.
    */
  def withLshSignature(corpus: DataFrame, dim: Int, planes: Int): DataFrame = {
    def planeVec(j: Int): Seq[Long] = (0 until dim).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1L else -1L
    }
    val sig = (0 until planes).map { j =>
      when(dotQ(col("qe"), typedLit(planeVec(j))) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    corpus.withColumn("sig", sig)
  }

  /** LSH-bucketed approximate top-k: candidates limited to buckets within
    * hamming distance `probe` of the query signature (multi-probe LSH).
    * Trades recall for a candidate set ~2^planes times smaller than
    * brute force; see SimilaritySpec for the measured recall on the
    * near-duplicate workload.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      planes: Int = 8, probe: Int = 1): DataFrame = {
    val q = withLshSignature(withNorm(queries), dim, planes)
      .select(col("id").as("qid"), col("qe").as("qv"), col("__nrm").as("qn"),
        col("sig").as("qsig"))
    val c = withLshSignature(withNorm(corpus), dim, planes)
      .select(col("id").as("nid"), col("qe").as("nv"), col("__nrm").as("nn"),
        col("sig").as("nsig"))
    rankTopK(broadcast(q).join(c,
        col("qid") =!= col("nid") &&
        bit_count(col("qsig").bitwiseXOR(col("nsig"))) <= probe)
      .select(col("qid"), col("nid"),
        cosFromParts(dotQ(col("qv"), col("nv")), col("qn"), col("nn")).as("sim")), k)
  }

  /** Near-duplicate pairs: same cell, quantized cosine above threshold. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val n = withNorm(corpus)
    val l = n.select(col("id").as("a"), col("cell"), col("qe").as("av"), col("__nrm").as("an"))
    val r = n.select(col("id").as("b"), col("cell"), col("qe").as("bv"), col("__nrm").as("bn"))
    l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        cosFromParts(dotQ(col("av"), col("bv")), col("an"), col("bn")).as("sim"))
      .filter(col("sim") > threshold)
  }
}
