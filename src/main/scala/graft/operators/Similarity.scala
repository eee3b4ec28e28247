package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Top-k by a named metric (reference similar_to options,
    * worker/task.go:2772 parseSimilarToOptions; distance fns
    * tok/hnsw/helper.go): euclidean ranks by SMALLEST distance —
    * dist² = |a|² + |b|² − 2·a·b stays exact integer arithmetic over the
    * quantized vectors, so the oracle hash-matches bit-for-bit;
    * dotproduct ranks by LARGEST dot (the reference's negative-dot
    * distance). Returns (qid, nid, <dist|dot>, rank).
    */
  def bruteForceTopKMetric(queries: DataFrame, corpus: DataFrame, k: Int,
      metric: String): DataFrame = {
    if (metric == "cosine") return bruteForceTopK(queries, corpus, k)
    val q = withNorm(queries).select(col("id").as("qid"), col("qe").as("qv"),
      col("__nrm").as("qn"))
    val c = withNorm(corpus).select(col("id").as("nid"), col("qe").as("nv"),
      col("__nrm").as("nn"))
    val pairs = broadcast(q).join(c, col("qid") =!= col("nid"))
    metric match {
      case "euclidean" =>
        // score = −dist² (long-exact) so the shared max-heap ranks
        // nearest-first; the rendered dist is the IEEE sqrt both engines
        // compute from the same integer
        val d2 = col("qn") + col("nn") - lit(2L) * dotQ(col("qv"), col("nv"))
        rankTopK(pairs.select(col("qid"), col("nid"),
            (-d2).cast("double").as("sim")), k)
          .select(col("qid"), col("nid"), sqrt(-col("sim")).as("dist"),
            col("rank"))
      case "dotproduct" =>
        rankTopK(pairs.select(col("qid"), col("nid"),
            dotQ(col("qv"), col("nv")).cast("double").as("sim")), k)
          .select(col("qid"), col("nid"), col("sim").cast("long").as("dot"),
            col("rank"))
      case o => throw new IllegalArgumentException(s"unknown metric $o")
    }
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

  /** Per-partition HNSW top-k (reference tok/hnsw/persistent_hnsw.go —
    * see [[HnswIndex]]): the corpus shards into `nPartitions`, each task
    * builds one HNSW graph over its shard and beam-searches every
    * (broadcast) query against it, and the per-shard top-k merge through
    * the same bounded-heap aggregate as brute force. This is the
    * Lucene-per-shard layout: the graph walk stays machine-local, the
    * shards scale out, and the merge shuffles only k rows per
    * (query, shard).
    *
    * `efSearch >= shard size` degenerates the beam to an exhaustive
    * walk — the EXACT mode the oracle-gated plumbing query uses (same
    * pattern as the full-probe IVF gate); the approximate regime's
    * recall is asserted in SimilaritySpec. Index build is per-invocation
    * here; session reuse composes with a persisted shard layout the same
    * way ivfWrite/ivfRead do for the IVF index.
    */
  def hnswTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 12, efConstruction: Int = 64, efSearch: Int = 48,
      nPartitions: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(col("id"), col("qe")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qB = spark.sparkContext.broadcast(qRows)
    val scored = corpus.select(col("id"), col("qe"))
      .repartition(nPartitions, col("id"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val index = new HnswIndex(m, efConstruction)
        // HNSW construction is insertion-order-sensitive (pruning, entry
        // point, beam seeds) and post-shuffle iterator order is NOT
        // stable across task retries/speculation — sort by id so a
        // rebuilt shard is the same graph and retries stay idempotent
        it.toArray.sortBy(_._1).foreach { case (id, v) => index.insert(id, v) }
        qB.value.iterator.flatMap { case (qid, qv) =>
          index.search(qv, k + 1, math.max(efSearch, k + 1)).iterator.collect {
            case (nid, sim) if nid != qid => (qid, nid, sim)
          }.take(k)
        }
      }
      .toDF("qid", "nid", "sim")
    rankTopK(scored, k)
  }

  /** Persist per-shard HNSW graphs: the build-once half of build-once/
    * search-many (mirrors [[ivfWriteTrained]]; the reference persists its
    * graph the same way, tok/hnsw/persistent_hnsw.go). Each task builds
    * its shard's graph ONCE and dumps it as adjacency rows — (id, vector,
    * level, per-layer neighbor ids) — partitioned by shard. Construction
    * (beam searches per insert) dominates search by orders of magnitude
    * at scale; after this write, every search is a linear adjacency load
    * + graph walk. Shards are id-hash-partitioned and id-sorted inside,
    * so a rebuild is bit-identical (idempotent under task retry).
    */
  def hnswWrite(corpus: DataFrame, dir: String, m: Int = 12,
      efConstruction: Int = 64, nPartitions: Int = 4): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("id"), col("qe"))
      .repartition(nPartitions, col("id"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val index = new HnswIndex(m, efConstruction)
        it.toArray.sortBy(_._1).foreach { case (id, v) => index.insert(id, v) }
        val shard = org.apache.spark.TaskContext.getPartitionId()
        index.exportNodes.map { case (id, vec, lvl, nbs) =>
          (shard, id, vec, lvl, nbs)
        }
      }
      .toDF("shard", "id", "vec", "level", "nbs")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Search a PERSISTED HNSW index: group the stored adjacency rows by
    * shard, rebuild each shard's graph with a linear pass (no
    * construction-time beam searches — [[HnswIndex.fromNodes]]), walk it
    * for every broadcast query, merge per-shard top-k through the same
    * bounded-heap rank as every other ANN path. At cluster scale each
    * shard group is one task reading one shard directory.
    *
    * When the layout carries live mutations ([[hnswUpsert]] /
    * [[hnswDelete]]), tombstoned ids are masked out of the graph walk
    * (the beam over-fetches by the tombstone count so masked slots
    * can't starve the result) and the delta segment is scored exactly —
    * identical quantized-cosine arithmetic — into the same rank merge.
    */
  def hnswSearchStored(queries: DataFrame, spark: SparkSession,
      dir: String, k: Int, m: Int = 12, efConstruction: Int = 64,
      efSearch: Int = 48): DataFrame = {
    import spark.implicits._
    val qRows = queries.select(col("id"), col("qe")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qB = spark.sparkContext.broadcast(qRows)
    // tombstones are mutation-sized by the compaction contract (see
    // hnswUpsert) — a driver set, broadcast into the shard walk
    val tombF = new java.io.File(dir, "_tombstones")
    val tombDf =
      if (tombF.isDirectory)
        Some(spark.read.parquet(tombF.getAbsolutePath)
          .groupBy(col("id")).agg(max(col("seq")).as("__ts")))
      else None
    val tombIds: Set[Long] = tombDf.map(
      _.select(col("id")).collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)
    val tombB = spark.sparkContext.broadcast(tombIds)
    val over = k + tombIds.size
    val scored = spark.read.parquet(dir)
      .select(col("shard").cast("int"), col("id"), col("vec"),
        col("level"), col("nbs"))
      .as[(Int, Long, Array[Long], Int, Seq[Seq[Long]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val index = HnswIndex.fromNodes(m, efConstruction,
          rows.map { case (_, id, vec, lvl, nbs) => (id, vec, lvl, nbs) }.toArray)
        qB.value.iterator.flatMap { case (qid, qv) =>
          index.search(qv, over + 1, math.max(efSearch, over + 1))
            .iterator.collect {
              case (nid, sim) if nid != qid && !tombB.value.contains(nid) =>
                (qid, nid, sim)
            }.take(k)
        }
      }
      .toDF("qid", "nid", "sim")
    val deltaF = new java.io.File(dir, "_delta")
    val all =
      if (!deltaF.isDirectory) scored
      else {
        // latest write per id, dropped when a later tombstone covers it
        // (an upsert's own tombstone shares its seq — strict < survives)
        val latest = spark.read.parquet(deltaF.getAbsolutePath)
          .groupBy(col("id"))
          .agg(max_by(col("qe"), col("seq")).as("qe"), max(col("seq")).as("seq"))
        val live = tombDf.map(t =>
            latest.join(t, Seq("id"), "left")
              .filter(col("__ts").isNull || col("__ts") <= col("seq")))
          .getOrElse(latest)
          .select(col("id"), col("qe"))
        val q = withNorm(queries).select(col("id").as("qid"),
          col("qe").as("qv"), col("__nrm").as("qn"))
        val c = withNorm(live).select(col("id").as("nid"),
          col("qe").as("nv"), col("__nrm").as("nn"))
        scored.unionByName(broadcast(q).join(c, col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            cosFromParts(dotQ(col("qv"), col("nv")),
              col("qn"), col("nn")).as("sim")))
      }
    rankTopK(all, k)
  }

  /** Incremental maintenance of a persisted HNSW layout — the
    * Spark-native analogue of the reference's transactional
    * vector-posting maintenance (posting/index.go:585
    * AddMutationWithIndex writes HNSW postings with the mutation;
    * tok/hnsw/persistent_hnsw.go persists them): sealed base shards
    * stay immutable; an upsert appends its vectors to a DELTA segment
    * (`<dir>/_delta`) and its ids to a TOMBSTONE segment
    * (`<dir>/_tombstones`) — underscore-prefixed, so the base shard
    * reader never sees either. [[hnswSearchStored]] masks tombstoned
    * ids out of the graph walk and scores the delta exactly into the
    * same rank merge, so a mutate-then-search sequence serves the new
    * vector immediately, no rebuild.
    *
    * Scale contract (the LSM shape): the delta stays mutation-sized —
    * when it outgrows a fraction of the base, compact by rebuilding the
    * shards over the merged corpus ([[hnswWrite]]). One writer per
    * index dir (the reference serializes index mutations through its
    * single write path).
    */
  def hnswUpsert(spark: SparkSession, dir: String, vectors: DataFrame): Unit = {
    val seq = nextIndexSeq(spark, dir)
    vectors.select(col("id"), lit(seq).as("seq"))
      .write.mode("append").parquet(s"$dir/_tombstones")
    vectors.select(col("id"), col("qe"), lit(seq).as("seq"))
      .write.mode("append").parquet(s"$dir/_delta")
  }

  /** Delete ids from a persisted HNSW layout: tombstone only — masks
    * the base graph and any delta write older than this delete.
    */
  def hnswDelete(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val seq = nextIndexSeq(spark, dir)
    ids.select(col("id"), lit(seq).as("seq"))
      .write.mode("append").parquet(s"$dir/_tombstones")
  }

  private def nextIndexSeq(spark: SparkSession, dir: String): Long = {
    val t = new java.io.File(dir, "_tombstones")
    if (!t.isDirectory) 1L
    else {
      val r = spark.read.parquet(t.getAbsolutePath)
        .agg(max(col("seq"))).head
      if (r.isNullAt(0)) 1L else r.getLong(0) + 1L
    }
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

  /** Trained IVF coarse quantizer: k-means centroids over the quantized
    * vectors (the Spark-native stand-in for the reference's HNSW index
    * build, tok/hnsw/persistent_hnsw.go — a graph walk doesn't
    * distribute, a centroid table does). Centroids are METADATA
    * (nCells × dim longs on the driver, like the reference's entry-point
    * layer); training is iters × (one codegen'd assignment pass + one
    * explode/sum aggregation), all integer arithmetic, deterministic
    * init by md5(id) — re-running the build on re-partitioned data
    * yields bit-identical centroids.
    */
  def trainIvfCentroids(corpus: DataFrame, nCells: Int,
      iters: Int = 3): Seq[Seq[Long]] = {
    var cents: Seq[Seq[Long]] = corpus
      .withColumn("__h", md5(col("id").cast("string")))
      .orderBy(col("__h")).limit(nCells)
      .select(col("qe")).collect().map(_.getSeq[Long](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val assigned = corpus.withColumn("cell", assignCell(col("qe"), cents))
      // centroid update: explode to (cell, pos, v), exact long sums,
      // reassemble driver-side — nCells × dim rows, metadata-sized
      val sums = assigned
        .select(col("cell"), posexplode(col("qe")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / r.getLong(3)).toSeq
          case None => cents(c) // empty cell keeps its centroid
        }
      }
    }
    cents
  }

  /** Nearest-centroid cell id: argmin over cells of squared distance,
    * computed as -2·dot(q,c) + |c|² (the |q|² term is constant per row).
    * All-integer struct-min with the cell id as tie-break — codegen'd,
    * deterministic.
    */
  private def assignCell(qe: Column, cents: Seq[Seq[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      val cl = typedLit(c)
      struct((lit(-2L) * dotQ(qe, cl) + lit(c.map(x => x * x).sum)).as("d"),
        lit(i).as("cell"))
    }: _*)).getField("cell")

  /** The `probes` nearest cells of a query vector (multi-probe IVF):
    * sort the (distance, cell) structs, slice. */
  private def probeCells(qe: Column, cents: Seq[Seq[Long]], probes: Int): Column =
    transform(
      slice(sort_array(array(cents.zipWithIndex.map { case (c, i) =>
        val cl = typedLit(c)
        struct((lit(-2L) * dotQ(qe, cl) + lit(c.map(x => x * x).sum)).as("d"),
          lit(i).as("cell"))
      }: _*)), 1, probes),
      x => x.getField("cell"))

  /** IVF-Flat search with a trained quantizer: each query scans only its
    * `probes` nearest cells. At scale the corpus is written partitioned
    * by cell (one directory per cell), so a probe is a partition-pruned
    * scan — no shuffle, no graph walk; recall is tuned by `probes`
    * exactly like the reference tunes ef (tok/hnsw/ef_recall_test.go).
    */
  def ivfSearchTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: Seq[Seq[Long]], probes: Int): DataFrame = {
    val c = withNorm(corpus)
      .withColumn("cell", assignCell(col("qe"), cents))
      .select(col("id").as("nid"), col("cell"), col("qe").as("nv"),
        col("__nrm").as("nn"))
    val q = withNorm(queries)
      .select(col("id").as("qid"), col("qe").as("qv"), col("__nrm").as("qn"),
        explode(probeCells(col("qe"), cents, probes)).as("cell"))
    rankTopK(broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosFromParts(dotQ(col("qv"), col("nv")), col("qn"), col("nn")).as("sim")), k)
  }

  /** Persist a trained IVF index: centroids as metadata parquet (cell,
    * centroid) plus the corpus written PARTITIONED BY assigned cell —
    * the build-once/search-many layout. At scale a probe becomes a
    * directory-pruned scan of `probes` cell partitions; nothing else is
    * read (the reference persists its HNSW the same build-once way,
    * tok/hnsw/persistent_hnsw.go). Returns the trained centroids.
    */
  def ivfWrite(corpus: DataFrame, dir: String, nCells: Int,
      iters: Int = 3): Seq[Seq[Long]] =
    ivfWriteTrained(corpus, dir, trainIvfCentroids(corpus, nCells, iters))

  /** Persist with ALREADY-trained centroids: training is a separate,
    * cacheable step (per (session, corpus) — the reference trains its
    * index once, not per search), while the write stays the per-index
    * job.
    */
  def ivfWriteTrained(corpus: DataFrame, dir: String,
      cents: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    corpus.select(col("id"), col("qe"))
      .withColumn("cell", assignCell(col("qe"), cents))
      // cluster by the partition column before the partitioned write
      // (guide §6 / Iceberg hash distribution-mode): without it every
      // scan task opens a writer PER CELL it touches — tasks × cells
      // small files at scale; with it each cell is one writer's file
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    cents
  }

  /** Load a persisted IVF index: (cell-partitioned corpus, centroids). */
  def ivfRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Seq[Seq[Long]]) = {
    val cents = spark.read.parquet(s"$dir/centroids").orderBy(col("cell"))
      .select(col("centroid")).collect().map(_.getSeq[Long](0).toSeq).toSeq
    (spark.read.parquet(s"$dir/cells"), cents)
  }

  /** IVF search over a PERSISTED index: the stored corpus already
    * carries its cell (a partition column), so the probe-cell equi-join
    * prunes to `probes` directories — no assignment pass, no corpus
    * shuffle. probes = nCells degrades gracefully to exact search.
    */
  def ivfSearchStored(queries: DataFrame, stored: DataFrame, k: Int,
      cents: Seq[Seq[Long]], probes: Int): DataFrame = {
    val c = withNorm(stored).select(col("id").as("nid"), col("cell"),
      col("qe").as("nv"), col("__nrm").as("nn"))
    val q = withNorm(queries)
      .select(col("id").as("qid"), col("qe").as("qv"), col("__nrm").as("qn"),
        explode(probeCells(col("qe"), cents, probes)).as("cell"))
    rankTopK(broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosFromParts(dotQ(col("qv"), col("nv")), col("qn"), col("nn")).as("sim")), k)
  }

  /** Incremental maintenance of a persisted IVF layout — the same
    * delta/tombstone scheme as [[hnswUpsert]] (reference analogue:
    * posting/index.go:585 AddMutationWithIndex maintains vector
    * postings transactionally with the write): the sealed
    * cell-partitioned base stays immutable; upserts append vectors to
    * `<dir>/_delta` and their ids to `<dir>/_tombstones`. Centroids are
    * NOT retrained — an IVF insert is a list append under fixed
    * centroids (the standard inverted-file maintenance contract), so
    * the delta joins the probe by assigning its cells on the fly.
    * Compaction: when the delta outgrows a fraction of the base,
    * rewrite with [[ivfWriteTrained]] over the merged corpus.
    */
  def ivfUpsert(spark: SparkSession, dir: String, vectors: DataFrame): Unit =
    hnswUpsert(spark, dir, vectors) // same segment layout, same write

  /** Delete ids from a persisted IVF layout: tombstone only. */
  def ivfDelete(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    hnswDelete(spark, dir, ids) // same segment layout, same write

  /** IVF search over a persisted index INCLUDING live mutations: base
    * rows lose to any covering tombstone (the base predates every
    * mutation), the latest live delta rows are cell-assigned with the
    * stored centroids and ride the SAME probe-cell equi-join — the
    * probe filter pushes through the union, so the base branch keeps
    * its directory pruning and the delta branch is mutation-sized.
    */
  def ivfSearchLive(queries: DataFrame, spark: SparkSession, dir: String,
      k: Int, probes: Int): DataFrame = {
    val (stored, cents) = ivfRead(spark, dir)
    val tombF = new java.io.File(dir, "_tombstones")
    val tombDf =
      if (tombF.isDirectory)
        Some(spark.read.parquet(tombF.getAbsolutePath)
          .groupBy(col("id")).agg(max(col("seq")).as("__ts")))
      else None
    val baseLive = tombDf.map(t => stored.join(
        broadcast(t.select(col("id"))), Seq("id"), "left_anti"))
      .getOrElse(stored)
      .select(col("id"), col("qe"), col("cell").cast("int").as("cell"))
    val deltaF = new java.io.File(dir, "_delta")
    val corpus = if (!deltaF.isDirectory) baseLive else {
      // latest write per id; an upsert's own tombstone shares its seq —
      // strict < survives (same rule as the HNSW delta)
      val latest = spark.read.parquet(deltaF.getAbsolutePath)
        .groupBy(col("id"))
        .agg(max_by(col("qe"), col("seq")).as("qe"), max(col("seq")).as("seq"))
      val live = tombDf.map(t =>
          latest.join(t, Seq("id"), "left")
            .filter(col("__ts").isNull || col("__ts") <= col("seq")))
        .getOrElse(latest)
        .select(col("id"), col("qe"),
          assignCell(col("qe"), cents).cast("int").as("cell"))
      baseLive.unionByName(live)
    }
    ivfSearchStored(queries, corpus, k, cents, probes)
  }

  // ---- Product quantization (PQ): ADC search over compressed codes ----
  //
  // The memory-scale path the flat layouts can't reach: a 100 TB corpus
  // of float32 vectors stores as m small codes per vector (one codebook
  // lookup each), and search never reads the raw vectors — only the
  // (id, codes) frame plus metadata-sized codebooks on the driver. The
  // reference keeps whole float vectors in its HNSW posting lists
  // (tok/hnsw/persistent_hnsw.go); PQ is the standard compressed
  // complement (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", TPAMI 2011), composable with the IVF cell layout
  // above exactly as IVF-PQ.

  /** Nearest codeword id in one subspace: argmin of −2·dot + |w|² (the
    * |x|² term is per-row constant) — integer struct-min, codeword id as
    * tie-break, codegen'd.
    */
  private def assignCode(sv: Column, words: Seq[Seq[Long]]): Column =
    array_min(array(words.zipWithIndex.map { case (w, i) =>
      struct((lit(-2L) * dotQ(sv, typedLit(w)) + lit(w.map(x => x * x).sum)).as("d"),
        lit(i).as("c"))
    }: _*)).getField("c")

  /** Train PQ codebooks: `m` subspaces × ≤`ksub` codewords × (dim/m)
    * longs. Deterministic k-means per subspace — seeds are the `ksub`
    * rows with smallest md5(id) (same rule as [[trainIvfCentroids]]), so
    * retrains and repartitionings yield identical codebooks. Each
    * iteration is one distributed assignment+sum pass per subspace; the
    * collected update is m × ksub × (dim/m) rows — metadata-sized.
    */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int,
      iters: Int = 3): Seq[Seq[Seq[Long]]] = {
    val dim = corpus.select(size(col("qe"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val seeds = corpus.withColumn("__h", md5(col("id").cast("string")))
      .orderBy(col("__h")).limit(ksub)
      .select(col("qe")).collect().map(_.getSeq[Long](0))
    var books: Seq[Seq[Seq[Long]]] = (0 until m).map(s =>
      seeds.map(v => v.slice(s * sub, (s + 1) * sub).toSeq).distinct.toSeq)
    for (_ <- 0 until iters) {
      val assigned = (0 until m).map { s =>
        corpus.select(lit(s).as("sub"),
          assignCode(slice(col("qe"), s * sub + 1, sub), books(s)).as("code"),
          posexplode(slice(col("qe"), s * sub + 1, sub)).as(Seq("pos", "v")))
      }.reduce(_ unionAll _)
      val sums = assigned.groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n")).collect()
      val bySub = sums.groupBy(_.getInt(0))
      books = books.indices.map { s =>
        val byCode = bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
        books(s).indices.map { c =>
          byCode.get(c) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map(r => r.getLong(3) / r.getLong(4)).toSeq
            case None => books(s)(c) // empty codeword keeps its value
          }
        }
      }
    }
    books
  }

  /** Exact codebooks for bounded-cardinality subspaces: every distinct
    * subvector becomes a codeword (sorted, so deterministic), making
    * encode→decode lossless — the degenerate config the oracle gate
    * uses (same split as full-probe IVF / full-ef HNSW: the gate proves
    * the distributed encode/search plumbing bit-exact, the k-means
    * regime's quality lives in the recall suite). Real corpora with
    * categorical or binned embedding columns hit this path too. Throws
    * past `maxWords` — the codebook is driver metadata by contract.
    */
  def pqCodebooksExact(corpus: DataFrame, m: Int,
      maxWords: Int = 4096): Seq[Seq[Seq[Long]]] = {
    val dim = corpus.select(size(col("qe"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).map { s =>
      val words = corpus
        .select(slice(col("qe"), s * sub + 1, sub).as("sv"))
        .distinct().orderBy(col("sv")).limit(maxWords + 1)
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      require(words.size <= maxWords,
        s"subspace $s exceeds $maxWords distinct subvectors — train instead")
      words
    }
  }

  /** Encode: append `codes` (m small ints) — the compressed form. The
    * raw `qe` column is untouched; a persisted index keeps codes ONLY
    * ([[pqWrite]]).
    */
  def pqEncode(corpus: DataFrame, books: Seq[Seq[Seq[Long]]]): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    corpus.withColumn("codes", array((0 until m).map(s =>
      assignCode(slice(col("qe"), s * sub + 1, sub), books(s))): _*))
  }

  /** Top-k by asymmetric distance (ADC): the query keeps its exact
    * vector, each corpus row is scored from codes alone —
    * dot(q, x̂) = Σ_s dot(q_s, codeword(code_s)) and |x̂|² = Σ_s |w|² —
    * all integer-exact given integer codewords. The per-(query,
    * codeword) dot partials are cached in a per-query lookup table on
    * the broadcast side, so per-pair work is m lookups + adds. Scan
    * reads (id, codes) only — at scale that is the entire point.
    */
  /** Reconstructed |x̂|² = Σ_s |codeword(code_s)|² from per-word norms. */
  private def adcNorm(codes: Column, books: Seq[Seq[Seq[Long]]]): Column =
    books.indices.map { s =>
      element_at(typedLit(books(s).map(w => w.map(x => x * x).sum)),
        element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  def pqSearchTopK(queries: DataFrame, encoded: DataFrame, k: Int,
      books: Seq[Seq[Seq[Long]]], metric: String = "cosine"): DataFrame = {
    val sub = books.head.head.size
    // the classic ADC lookup table (Jégou et al. §IV-A): per QUERY and
    // subspace, dot q_s against every codeword ONCE — |q| × m × ksub
    // partials on the broadcast side — so the per-pair work collapses
    // to m array lookups + adds instead of m slice+dot folds. Identical
    // integers (the LUT caches the same dotQ the fold computed), so
    // ranked results are bit-identical.
    val lut = array(books.indices.map { s =>
      transform(typedLit(books(s)),
        w => dotQ(slice(col("qe"), s * sub + 1, sub), w))
    }: _*)
    def lutDot(codes: Column): Column =
      books.indices.map(s => element_at(element_at(col("lut"), s + 1),
        element_at(codes, s + 1).cast("int") + 1)).reduce(_ + _)
    def recNorm(codes: Column): Column = adcNorm(codes, books)
    val q = withNorm(queries).select(col("id").as("qid"), lut.as("lut"),
      col("__nrm").as("qn"))
    val c = encoded.select(col("id").as("nid"), col("codes"))
    val pairs = broadcast(q).join(c, col("qid") =!= col("nid"))
    metric match {
      case "cosine" =>
        rankTopK(pairs.select(col("qid"), col("nid"),
          cosFromParts(lutDot(col("codes")), col("qn"),
            recNorm(col("codes"))).as("sim")), k)
      case "dotproduct" =>
        rankTopK(pairs.select(col("qid"), col("nid"),
            lutDot(col("codes")).cast("double").as("sim")), k)
          .select(col("qid"), col("nid"), col("sim").cast("long").as("dot"),
            col("rank"))
      case o => throw new IllegalArgumentException(s"unknown metric $o")
    }
  }

  /** Persist a PQ index: codebooks as metadata parquet plus the corpus
    * as (id, codes) ONLY — m small ints per vector instead of dim longs,
    * the compressed build-once/search-many layout ([[ivfWrite]]'s cell
    * partitioning composes on top for IVF-PQ).
    */
  def pqWrite(corpus: DataFrame, dir: String,
      books: Seq[Seq[Seq[Long]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    books.zipWithIndex.flatMap { case (ws, s) =>
      ws.zipWithIndex.map { case (w, c) => (s, c, w) }
    }.toDF("sub", "code", "word")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    pqEncode(corpus, books).select(col("id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Load a persisted PQ index: ((id, codes) frame, codebooks). */
  def pqRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Seq[Seq[Seq[Long]]]) = {
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
      .sortBy(_.getInt(1)).map(_.getSeq[Long](2).toSeq).toSeq)
    (spark.read.parquet(s"$dir/codes"), books)
  }

  // ---- IVF-PQ: cell-pruned ADC — the full compressed index layout ----

  /** Persist an IVF-PQ index: coarse centroids + PQ codebooks as
    * metadata, the corpus as (id, codes) PARTITIONED BY its coarse
    * cell. A probe reads `probes` cell directories of m-int codes —
    * both prunings compose: directory pruning bounds what is read,
    * code compression bounds what it costs to read. This is the
    * standard billion-scale layout (IVFADC in Jégou et al. 2011).
    */
  def ivfPqWrite(corpus: DataFrame, dir: String, cents: Seq[Seq[Long]],
      books: Seq[Seq[Seq[Long]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (ws, s) =>
      ws.zipWithIndex.map { case (w, c) => (s, c, w) }
    }.toDF("sub", "code", "word")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    pqEncode(corpus, books)
      .withColumn("cell", assignCell(col("qe"), cents))
      .select(col("id"), col("cell"), col("codes"))
      // same writer-per-(task, cell) rationale as ivfWriteTrained
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** Load a persisted IVF-PQ index. */
  def ivfPqRead(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, Seq[Seq[Long]], Seq[Seq[Seq[Long]]]) = {
    val cents = spark.read.parquet(s"$dir/centroids").orderBy(col("cell"))
      .select(col("centroid")).collect().map(_.getSeq[Long](0).toSeq).toSeq
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
      .sortBy(_.getInt(1)).map(_.getSeq[Long](2).toSeq).toSeq)
    (spark.read.parquet(s"$dir/codes"), cents, books)
  }

  /** IVF-PQ search: each query explodes to its `probes` nearest cells
    * (partition-pruned directory reads on the stored layout), candidates
    * score by ADC from codes alone. probes = nCells + exact codebooks
    * degrades to exact search — the oracle-gate configuration.
    */
  def ivfPqSearchStored(queries: DataFrame, stored: DataFrame, k: Int,
      cents: Seq[Seq[Long]], books: Seq[Seq[Seq[Long]]], probes: Int,
      metric: String = "cosine"): DataFrame = {
    val sub = books.head.head.size
    // same per-query ADC LUT as pqSearchTopK, computed BEFORE the
    // probe-cell explode so each query pays it once, not per probe
    val lut = array(books.indices.map { s =>
      transform(typedLit(books(s)),
        w => dotQ(slice(col("qe"), s * sub + 1, sub), w))
    }: _*)
    def lutDot(codes: Column): Column =
      books.indices.map(s => element_at(element_at(col("lut"), s + 1),
        element_at(codes, s + 1).cast("int") + 1)).reduce(_ + _)
    val c = stored.select(col("id").as("nid"), col("cell"), col("codes"))
    val q = withNorm(queries)
      .select(col("id").as("qid"), lut.as("lut"), col("__nrm").as("qn"),
        col("qe"))
      .select(col("qid"), col("lut"), col("qn"),
        explode(probeCells(col("qe"), cents, probes)).as("cell"))
    val pairs = broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
    metric match {
      case "cosine" =>
        rankTopK(pairs.select(col("qid"), col("nid"),
          cosFromParts(lutDot(col("codes")), col("qn"),
            adcNorm(col("codes"), books)).as("sim")), k)
      case "dotproduct" =>
        rankTopK(pairs.select(col("qid"), col("nid"),
            lutDot(col("codes")).cast("double").as("sim")), k)
          .select(col("qid"), col("nid"), col("sim").cast("long").as("dot"),
            col("rank"))
      case o => throw new IllegalArgumentException(s"unknown metric $o")
    }
  }

  /** Exact all-pairs (a < b) within cell over a pre-normed frame:
    * (a, b, sim) unthresholded. Quadratic in cell occupancy — only
    * reachable through [[nearDup]]'s small-cell branch or the explicit
    * verifier [[nearDupPairs]].
    */
  private def exactCellPairs(n: DataFrame): DataFrame = {
    val l = n.select(col("id").as("a"), col("cell"), col("qe").as("av"), col("__nrm").as("an"))
    val r = n.select(col("id").as("b"), col("cell"), col("qe").as("bv"), col("__nrm").as("bn"))
    l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        cosFromParts(dotQ(col("av"), col("bv")), col("an"), col("bn")).as("sim"))
  }

  /** EXACT near-duplicate pairs: same cell, quantized cosine above
    * threshold. This is the bounded-input VERIFIER, not the public
    * operator — it is quadratic in cell occupancy (measured 24× steady
    * at sf1, 124 s at sf3). Call [[nearDup]] instead: it runs this
    * all-pairs only on cells under its occupancy cap and bands the
    * rest, mirroring how brute-force top-k is positioned vs the ANN
    * stack.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame =
    exactCellPairs(withNorm(corpus)).filter(col("sim") > threshold)

  /** Deterministic ±1 hyperplane component for (band, bit, dim) — the
    * shared pattern BOTH engines rebuild literally (the oracle emits
    * the same values as SQL array literals), so banded candidates are
    * bit-identical across engines.
    */
  def hyperplaneSign(b: Int, j: Int, i: Int): Long = {
    // a REAL mix, not a linear parity: ((b·131+j)·31+i) % 2 alternates
    // strictly in i, making all hyperplanes ±one vector and collapsing
    // every band to two buckets (measured: slower than all-pairs)
    var h = (b * 73856093) ^ (j * 19349663) ^ (i * 83492791)
    h ^= h >>> 13; h *= 0x5bd1e995; h ^= h >>> 15
    if ((h & 1) == 0) 1L else -1L
  }

  /** Banded embedding near-dup — the SCALE PATH for [[nearDupPairs]].
    * Within-cell all-pairs is quadratic in cell occupancy (measured:
    * sf1→sf3 grew 3× data into ~9× candidate pairs); here candidates
    * come from `bands` random-hyperplane sign buckets inside the cell —
    * bucket sizes stay O(n / (cells·2^bits)), so the candidate join is
    * near-linear. Recall is the banding probability by design (a pair
    * must agree on all `bits` signs of some band); the gate's oracle
    * replays the SAME hyperplanes, so the semantic — band → bucket-join
    * → exact cosine verify — is pinned deterministically. Pairs dedup
    * BEFORE the vectors re-join: a candidate row is 16 bytes through
    * the distinct, not a 2×dim payload.
    */
  def nearDupPairsBanded(corpus: DataFrame, threshold: Double, dim: Int,
      bands: Int = 4, bits: Int = 8): DataFrame =
    bandedCellPairs(withNorm(corpus), dim, bands, bits)
      .filter(col("sim") > threshold)

  /** Band → bucket-join → exact-cosine candidates over a pre-normed
    * frame: (a, b, sim) unthresholded. Shared core of
    * [[nearDupPairsBanded]] and [[nearDup]]'s large-cell branch.
    */
  private def bandedCellPairs(n: DataFrame, dim: Int,
      bands: Int, bits: Int): DataFrame = {
    def bandVal(b: Int): Column =
      (0 until bits).map { j =>
        val sgns = array((0 until dim).map(i =>
          lit(hyperplaneSign(b, j, i))): _*)
        val dot = aggregate(zip_with(col("qe"), sgns, (x, s) => x * s),
          lit(0L), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    // signatures computed once (one corpus pass), read once per band
    val sigs = n.select(col("id") +: col("cell") +: col("qe") +:
        col("__nrm") +:
        (0 until bands).map(b => bandVal(b).as(s"__band_$b")): _*)
      .localCheckpoint(eager = false)
    val cand = (0 until bands).map { b =>
      val l = sigs.select(col("id").as("a"), col("cell"),
        col(s"__band_$b").as("__bv"))
      val r = sigs.select(col("id").as("b"), col("cell"),
        col(s"__band_$b").as("__bv"))
      l.join(r, Seq("cell", "__bv")).filter(col("a") < col("b"))
        .select(col("a"), col("b"))
    }.reduce(_ unionByName _).dropDuplicates("a", "b")
    val va = sigs.select(col("id").as("a"), col("qe").as("av"),
      col("__nrm").as("an"))
    val vb = sigs.select(col("id").as("b"), col("qe").as("bv"),
      col("__nrm").as("bn"))
    cand.join(va, Seq("a")).join(vb, Seq("b"))
      .select(col("a"), col("b"),
        cosFromParts(dotQ(col("av"), col("bv")), col("an"), col("bn")).as("sim"))
  }

  /** Smallest bits-per-band in [minBits, maxBits] keeping the expected
    * band-bucket size under the occupancy cap: maxOcc / 2^bits ≤ cap.
    * Pure integer arithmetic so the DuckDB oracle replays it as a CASE
    * chain bit-for-bit.
    */
  def chooseBits(maxOcc: Long, occupancyCap: Int,
      minBits: Int, maxBits: Int): Int =
    (minBits to maxBits).find(b => maxOcc <= (occupancyCap.toLong << b))
      .getOrElse(maxBits)

  /** THE public embedding near-dup operator (default = the scale path).
    *
    * Hybrid by cell occupancy: cells at or under `occupancyCap` rows run
    * exact all-pairs (bounded quadratic — at most cap² pairs per cell);
    * cells above it run hyperplane-sign banding with bits-per-band
    * auto-scaled by [[chooseBits]] so bucket sizes stay
    * O(occ / 2^bits) ≤ O(cap) — the candidate join is near-linear in
    * corpus size at any scale. Recall on large cells is the banding
    * probability (a pair must agree on all `bits` signs of one of
    * `bands` bands); exact all-pairs ([[nearDupPairs]]) survives as the
    * bounded-input verifier, mirroring brute-force-vs-ANN.
    *
    * The per-cell occupancy aggregate is one O(n) pass collapsing to
    * coarse-quantizer-cell cardinality (metadata-sized, like centroids);
    * the scalar max and the broadcast tag join are fenced on that.
    */
  def nearDup(corpus: DataFrame, threshold: Double, dim: Int,
      occupancyCap: Int = 32, bands: Int = 4,
      minBits: Int = 4, maxBits: Int = 12): DataFrame = {
    // occupancy straight off the raw corpus: one (cell)-pruned scan
    // collapsing to quantizer-cell cardinality — no norm/signature work
    // materialized before the branch decision
    val occ = corpus.groupBy(col("cell")).agg(count(lit(1)).as("__occ"))
    val Array(minOcc, maxOcc) = occ
      .agg(min(col("__occ")), max(col("__occ"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val pairs =
      if (maxOcc <= occupancyCap) exactCellPairs(withNorm(corpus))
      else {
        val bits = chooseBits(maxOcc, occupancyCap, minBits, maxBits)
        if (minOcc > occupancyCap)
          // every cell is over the cap (the common shape at scale):
          // the split join would tag nothing — skip it
          bandedCellPairs(withNorm(corpus), dim, bands, bits)
        else {
          val tagged = withNorm(corpus).join(broadcast(occ), Seq("cell"))
          val small = tagged.filter(col("__occ") <= occupancyCap).drop("__occ")
          val large = tagged.filter(col("__occ") > occupancyCap).drop("__occ")
          exactCellPairs(small)
            .unionByName(bandedCellPairs(large, dim, bands, bits))
        }
      }
    pairs.filter(col("sim") > threshold)
  }
}
