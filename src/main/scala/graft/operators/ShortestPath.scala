package graft.operators

import org.apache.spark.graphx.{Edge, EdgeDirection, EdgeTriplet, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `shortest(from, to, numpaths, ...)` — single-source shortest path and
  * the k-shortest variant (reference query/shortest.go:457 shortestPath,
  * :286 runKShortestPaths; uniform-cost expansion with a priority queue).
  *
  * A driver-side priority queue doesn't distribute, so we run Pregel
  * (GraphX): vertex state = best known cost(s), messages = relaxations
  * along out-edges, iterate to fixpoint. Compared with a DataFrame
  * relax-join loop this has no per-round Catalyst planning/codegen cost
  * and convergence falls out of message counting (an empty message set
  * ends the computation — no separate probe actions). At cluster scale
  * the vertex RDD is hash-partitioned and messages shuffle only the
  * changed frontier per round — the same delta property the reference's
  * priority queue exploits sequentially.
  *
  * All merges are associative+commutative minima, so results are
  * partitioning-independent (deterministic under any executor count).
  */
object ShortestPath {

  private val Inf = Double.MaxValue

  /** GraphX runs several RDD jobs per superstep over EVERY partition, so
    * a small graph spread across 32+ shuffle partitions pays hundreds of
    * empty tasks per Pregel round (measured 15.6 s vs ~1 s at sf0.1 for a
    * 10²-edge cone). Right-size to one partition per ~250k edges — the
    * count is one narrow scan of a 3-column frame, amortized over the
    * many jobs of the iteration it feeds.
    */
  private def sized(spark: SparkSession, edges: DataFrame): DataFrame = {
    val n = edges.count()
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (n / 250000L).toInt + 1))
    edges.coalesce(parts)
  }

  /** Builds the graph guaranteeing the source is a vertex: Graph.fromEdges
    * derives vertices from edge endpoints only, so an isolated source (no
    * incident edges) would vanish and sssp would return {} instead of
    * {source -> 0}. A zero-weight self-loop fixes that without the extra
    * vertex-RDD co-partitioning stages of the explicit-vertex Graph
    * constructor (measured ~3.5 s/query slower at sf0.1): the loop never
    * relaxes anything (cost+0 to itself is never an improvement, and path
    * extension through an already-visited node is blocked).
    */
  private def edgeGraph[S: scala.reflect.ClassTag](
      edges: DataFrame, source: Long, init: S): Graph[S, Double] = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("double"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val withSrc = e.union(e.sparkContext.parallelize(Seq(Edge(source, source, 0.0)), 1))
    Graph.fromEdges(withSrc, init)
  }

  /** Min cost from `source` to every reachable node.
    * edges: (src LONG, dst LONG, w DOUBLE). Returns (node, dist).
    */
  def sssp(spark: SparkSession, source: Long, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val g = edgeGraph(sized(spark, edges), source, Inf)
      .mapVertices((id, _) => if (id == source) 0.0 else Inf)
    val res = g.pregel(Inf, maxIter, EdgeDirection.Out)(
      (_, d, msg) => math.min(d, msg),
      t => if (t.srcAttr != Inf && t.srcAttr + t.attr < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + t.attr)) else Iterator.empty,
      math.min)
    res.vertices.filter(_._2 != Inf).map { case (id, d) => (id, d) }
      .toDF("node", "dist")
  }

  /** k smallest *distinct* path costs per node (k-shortest analogue;
    * reference keeps k route objects — we keep the cost frontier, which
    * is the deterministic, set-semantics projection of that).
    * Returns (node, dist, rank) with rank 1..k.
    */
  def kBest(spark: SparkSession, source: Long, edges: DataFrame, k: Int,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    def mergeK(a: List[Double], b: List[Double]): List[Double] =
      (a ++ b).distinct.sorted.take(k)
    val g = edgeGraph(sized(spark, edges), source, List.empty[Double])
      .mapVertices((id, _) => if (id == source) List(0.0) else Nil)
    val res = g.pregel(List.empty[Double], maxIter, EdgeDirection.Out)(
      (_, s, msg) => mergeK(s, msg),
      t => {
        val cand = t.srcAttr.map(_ + t.attr)
        val useful = cand.filter(c => !t.dstAttr.contains(c) &&
          (t.dstAttr.size < k || c < t.dstAttr.max))
        if (useful.nonEmpty) Iterator((t.dstId, useful)) else Iterator.empty
      },
      mergeK)
    res.vertices.filter(_._2.nonEmpty)
      .flatMap { case (id, ds) =>
        ds.zipWithIndex.map { case (d, i) => (id, d, i + 1) }
      }
      .toDF("node", "dist", "rank")
  }

  /** True k-shortest PATH enumeration between two nodes (reference
    * query/shortest.go:286 runKShortestPaths): returns up to k distinct
    * simple paths from `source` to `target`, ranked by (cost, path).
    *
    * Vertex state = the k best (cost, "a->b->c") simple paths known to
    * reach that vertex; messages extend a path along an out-edge unless
    * the destination already lies on it (loop-free, like the reference's
    * route-visited check). Pruning to k per node is exact on layered
    * graphs (every tested graph here); on adversarial graphs where all k
    * best prefixes at an intermediate node conflict with the suffix, a
    * Yen-style detour search would be needed — documented trade-off.
    *
    * The (cost, path-string) order is total (no ties), so results are
    * partitioning-independent.
    */
  /** Restrict `edges` to the source's forward cone: iterative frontier
    * expansion until no new nodes, then a semi-join keeps only edges
    * leaving reached nodes. The reference's uniform-cost search touches
    * only this cone (query/shortest.go expandOut); without the pruning
    * the Pregel below would shuffle the FULL edge union every superstep —
    * measured 16.7 s vs ~4 s at sf0.1 for a 1.3M-edge union whose
    * relevant cone is ~10² edges.
    *
    * `edges` stays LAZY throughout — the full union is never
    * materialized (checkpointing 1.3M wide rows to find a 10²-edge cone
    * was the dominant cold cost of every shortest query). While the
    * frontier is metadata-sized (≤ [[DriverFrontierCap]] nodes, the
    * common case the reference's uniform-cost search exploits
    * sequentially), each round is a literal `src IN (...)` filter — it
    * reaches the parquet scans as a pushed predicate, so row-group
    * min/max pruning skips every branch whose uid namespace doesn't
    * overlap the frontier, and one round costs a pruned scan instead of
    * a full-union pass. If the frontier outgrows the cap (dense graphs
    * at scale), the remaining rounds switch to broadcast semi-joins over
    * the same lazy branches — fully distributed, no driver state.
    * 2000 keeps the literal `In` expression well inside the range where
    * Catalyst plan serialization and codegen stay cheap (a 50k-literal
    * In bloats the plan far before the driver memory matters).
    */
  private val DriverFrontierCap = 2000

  def forwardCone(spark: SparkSession, edges: DataFrame,
      source: Long, maxDepth: Int): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
    // driver-guided rounds: frontier as a pushed-down IN literal
    val reached = scala.collection.mutable.LinkedHashSet[Long](source)
    var frontier: Seq[Long] = Seq(source)
    var depth = 0
    var spilled = false
    while (!spilled && frontier.nonEmpty && depth < maxDepth) {
      // dedup on the driver, not via distinct(): a per-round 32-partition
      // shuffle of a 10²-row set is pure job overhead. The limit bounds
      // the transfer; it can truncate only when the raw edge fan-out
      // already exceeds the cap, which spills to the distributed path.
      val raw = e.filter(col("src").isin(frontier: _*))
        .select(col("dst"))
        .limit(DriverFrontierCap + 1).collect()
      val next = raw.iterator.map(_.getLong(0))
        .filterNot(reached.contains).toSeq.distinct
      if (raw.length > DriverFrontierCap || reached.size + next.length > DriverFrontierCap) {
        spilled = true // too big for the driver — finish distributed
      } else {
        reached ++= next
        frontier = next
        depth += 1
      }
    }
    if (!spilled) {
      e.filter(col("src").isin(reached.toSeq: _*))
    } else {
      // distributed continuation: same rounds as broadcast semi-joins
      var reachedDf = reached.toSeq.toDF("n").localCheckpoint()
      var frontierDf = frontier.toDF("n").localCheckpoint()
      var growing = true
      while (growing && depth < maxDepth) {
        // lazy checkpoint materialized by the count — one job per round
        val next = e.join(broadcast(frontierDf.select(col("n").as("src"))),
            Seq("src"), "left_semi")
          .select(col("dst").as("n")).distinct()
          .join(reachedDf, Seq("n"), "left_anti").localCheckpoint(false)
        growing = next.count() > 0
        if (growing) {
          reachedDf = reachedDf.unionByName(next)
          frontierDf = next
        }
        depth += 1
      }
      e.join(broadcast(reachedDf.select(col("n").as("src"))), Seq("src"), "left_semi")
    }
  }

  /** `preConed = true` marks `edges` as ALREADY the source's pruned,
    * partition-sized forward cone (e.g. a session-cached one from
    * [[forwardCone]]) — skips recomputing it.
    */
  def kShortestPaths(spark: SparkSession, source: Long, target: Long,
      edges: DataFrame, k: Int, maxIter: Int = 50,
      preConed: Boolean = false,
      minW: Double = Double.NegativeInfinity,
      maxW: Double = Double.PositiveInfinity): DataFrame = {
    import spark.implicits._
    type S = List[(Double, String)]
    // minweight shifts which completions count, but prefixes below the
    // bound can't be pruned mid-path (a cheap prefix may still complete
    // above minweight while its k-best siblings complete below it) — so
    // bounded searches carry extra intermediate capacity and ADAPT on
    // saturation (below). Like the plain-k pruning, exact on layered
    // graphs; adversarial funnels would need a Yen-style detour search
    // (documented trade-off).
    val kv0 =
      if (minW == Double.NegativeInfinity) k else math.max(3 * k, k + 8)
    // non-preConed cones are checkpointed before sized()'s count so the
    // iterative discovery runs once, not once per downstream job
    val pruned = sized(spark,
      if (preConed) edges
      else forwardCone(spark, edges, source, maxIter).localCheckpoint())

    /** One bounded-capacity Pregel run; reports whether any INTERMEDIATE
      * vertex saturated its kv slots (only possible source of
      * under-enumeration vs the reference's exact Dijkstra).
      */
    def runOnce(kv: Int): (org.apache.spark.graphx.VertexRDD[S], Boolean) = {
      // rank ties on cost break LONGER-hop-first — the reference's
      // enumeration yields the multi-hop route before the direct edge at
      // equal weight (TestShortestPathWithDepth allPaths: A→C→B(11)
      // before A→B(11); TestKShortestPathAllPaths the same at 22)
      def mergeK(a: S, b: S): S = (a ++ b).distinct
        .sortBy { case (c, p) => (c, -p.count(_ == '>'), p) }.take(kv)
      val g = edgeGraph(pruned, source, List.empty[(Double, String)])
        .mapVertices((id, _) => if (id == source) List((0.0, id.toString)) else Nil)
      val res = g.pregel(List.empty[(Double, String)], maxIter, EdgeDirection.Out)(
        // weight bounds (reference query/shortest.go:457 minweight/maxweight):
        // maxweight prunes EXPANSION below (weights are non-negative, a
        // too-heavy prefix can't recover); minweight only constrains COMPLETE
        // paths, so it filters at the target vertex — sub-minweight arrivals
        // never occupy one of the target's k slots
        (id, s, msg) => mergeK(s,
          if (id == target) msg.filter(_._1 >= minW) else msg),
        t => {
          val dstS = t.dstId.toString
          val ext = t.srcAttr.iterator
            .filter { case (c, p) => c + t.attr <= maxW && !p.split("->").contains(dstS) }
            .map { case (c, p) => (c + t.attr, p + "->" + dstS) }
            .toList
          val useful = ext.filter(e => mergeK(t.dstAttr, List(e)) != t.dstAttr)
          if (useful.nonEmpty) Iterator((t.dstId, useful)) else Iterator.empty
        },
        mergeK)
      val saturated = minW != Double.NegativeInfinity &&
        res.vertices.filter { case (id, s) => id != target && s.size >= kv }
          .take(1).nonEmpty
      (res.vertices, saturated)
    }

    // adaptive capacity: a saturated bounded run may have crowded a
    // qualifying prefix out of an intermediate vertex's slots — instead of
    // warning (r7-r9), retry with kv doubled until no vertex saturates or
    // the retry budget is spent (2 retries = 4× capacity; the cone is
    // checkpointed, so retries pay only the Pregel rounds)
    var kv = kv0
    var (verts, sat) = runOnce(kv)
    var retries = 0
    while (sat && retries < 2) {
      kv *= 2
      retries += 1
      val r = runOnce(kv)
      verts = r._1
      sat = r._2
    }
    if (sat)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"kShortestPaths: state capacity kv=$kv still saturated under " +
          s"minweight=$minW after $retries retries — results may under-enumerate")
    verts.filter(_._1 == target)
      .flatMap { case (_, s) =>
        // state capacity is kv ≥ k; the answer is the k best
        s.take(k).zipWithIndex.map { case ((c, p), i) => (i + 1, c, p) }
      }
      .toDF("rank", "dist", "path")
  }

  /** Shortest path WITH the route itself (reference returns `_path_`
    * objects, query/shortest.go:457). Vertex state carries the best
    * (cost, "a->b->c" route); ties break to the lexicographically
    * smallest route, making the answer deterministic.
    * edges: (src, dst, w). Returns (node, dist, path).
    */
  def ssspWithPaths(spark: SparkSession, source: Long, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    type S = (Double, String)
    val none: S = (Inf, null)
    def better(a: S, b: S): S =
      if (a._1 < b._1) a
      else if (b._1 < a._1) b
      else if (a._2 == null) b
      else if (b._2 == null) a
      else if (a._2 <= b._2) a else b
    val g = edgeGraph(sized(spark, edges), source, none)
      .mapVertices((id, _) => if (id == source) (0.0, source.toString) else none)
    val res = g.pregel(none, maxIter, EdgeDirection.Out)(
      (_, s, msg) => better(s, msg),
      (t: EdgeTriplet[S, Double]) => {
        if (t.srcAttr._1 == Inf) Iterator.empty
        else {
          val cand = (t.srcAttr._1 + t.attr, t.srcAttr._2 + "->" + t.dstId)
          if (better(cand, t.dstAttr) == cand && cand != t.dstAttr)
            Iterator((t.dstId, cand))
          else Iterator.empty
        }
      },
      better)
    res.vertices.filter(_._2._1 != Inf)
      .map { case (id, (d, p)) => (id, d, p) }
      .toDF("node", "dist", "path")
  }
}
