package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `shortest(from, to, numpaths, ...)` — single-source shortest path and
  * the k-shortest variant (reference query/shortest.go:457 shortestPath,
  * :286 runKShortestPaths; uniform-cost expansion with a priority queue).
  *
  * A driver-side priority queue doesn't distribute, so we use the
  * classic Spark SSSP shape: iterative relax-join (Bellman-Ford rounds).
  * Each round: dist ⋈ edges → candidate costs → per-node min (or top-k).
  * Rounds are bounded by the graph diameter; convergence is detected when
  * a round changes nothing. `localCheckpoint` truncates lineage per round.
  * At cluster scale the dist table is partitioned by node and the edge
  * table is bucketed on src, so the relax join co-partitions and only the
  * (small) delta frontier shuffles.
  */
object ShortestPath {

  /** Min cost from `source` to every reachable node.
    * edges: (src LONG, dst LONG, w LONG). Returns (node, dist).
    */
  def sssp(spark: SparkSession, source: Long, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      // convergence probe costs an extra action per round — amortize it
      // by checking every third round (and near the iteration cap)
      if (i % 3 == 2 || i >= maxIter - 2)
        converged = relaxed.join(dist, Seq("node", "dist"), "left_anti").isEmpty
      dist = relaxed
      i += 1
    }
    dist
  }

  /** k smallest *distinct* path costs per node (k-shortest analogue;
    * reference keeps k route objects — we keep the cost frontier, which
    * is the deterministic, set-semantics projection of that).
    * Returns (node, dist, rank) with rank 1..k.
    */
  def kBest(spark: SparkSession, source: Long, edges: DataFrame, k: Int,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
    val w = Window.partitionBy(col("node")).orderBy(col("dist"))
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
        .unionByName(dist)
        .distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .localCheckpoint(true)
      if (i % 3 == 2 || i >= maxIter - 2)
        converged = relaxed.join(dist, Seq("node", "dist"), "left_anti").isEmpty
      dist = relaxed
      i += 1
    }
    dist.withColumn("rank", row_number().over(w))
  }

  /** Shortest path WITH the route itself (reference returns `_path_`
    * objects, query/shortest.go:457). Each relaxation round carries the
    * path as a "a->b->c" string; per node we keep the (cost, path)
    * struct-minimum, which is min cost with the lexicographically
    * smallest path as the deterministic tie-break.
    * edges: (src, dst, w). Returns (node, dist, path).
    */
  def ssspWithPaths(spark: SparkSession, source: Long, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
    var dist = Seq((source, 0L, source.toString)).toDF("node", "dist", "path")
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"),
          concat(dist("path"), lit("->"), e("dst").cast("string")).as("path"))
        .unionByName(dist)
        .groupBy("node")
        .agg(min(struct(col("dist"), col("path"))).as("best"))
        .select(col("node"), col("best.dist").as("dist"), col("best.path").as("path"))
        .localCheckpoint(true)
      if (i % 3 == 2 || i >= maxIter - 2)
        converged = relaxed.join(dist, Seq("node", "dist", "path"), "left_anti").isEmpty
      dist = relaxed
      i += 1
    }
    dist
  }
}
