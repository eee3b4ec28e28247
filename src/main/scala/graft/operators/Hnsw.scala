package graft.operators

import scala.collection.mutable

/** In-memory HNSW graph index (reference tok/hnsw/persistent_hnsw.go —
  * Malkov & Yashunin, "Efficient and robust approximate nearest neighbor
  * search using Hierarchical Navigable Small World graphs").
  *
  * This is the SINGLE-MACHINE core: a multi-layer proximity graph with
  * greedy descent through the upper layers and a beam search (width
  * `ef`) at layer 0. The distributed shape lives in
  * [[Similarity.hnswTopK]] — one index per PARTITION, queries broadcast,
  * per-partition top-k merged by the bounded-heap aggregate (the same
  * shard-local-index/global-merge layout as Lucene-per-shard search; a
  * pointer-chasing graph walk does not distribute, sharding it does).
  *
  * Determinism: the reference assigns levels from a PRNG; here the level
  * comes from a hash of the node id, so a rebuild of the same partition
  * yields the same graph and the same results — required for the oracle
  * gate and for Spark task retries to be idempotent.
  *
  * Vectors are the pipeline's quantized Long arrays; the similarity is
  * quantized cosine (exact integer dot / precomputed integer norms, one
  * double op chain) — bit-identical to Similarity's brute-force scoring.
  *
  * Memory bound at scale: one shard's graph is O(n·(dim + m)) longs and
  * must fit its task — at 100 TB the caller sizes `nPartitions` so each
  * shard holds ~1–5 M vectors per executor core (64-dim quantized ≈
  * 0.5 KB/vector ⇒ ~2.5 GB at 5 M), exactly how per-shard Lucene/HNSW
  * deployments size shards; the merge cost stays k rows per
  * (query, shard) regardless.
  */
final class HnswIndex(m: Int = 12, efConstruction: Int = 64) {
  require(m >= 2, s"HNSW m must be >= 2, got $m")
  private val mMax0 = 2 * m // layer-0 degree cap (standard HNSW setting)
  private val levelNorm = 1.0 / math.log(m.toDouble)

  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Long]]
  private val norms = mutable.ArrayBuffer.empty[Double]
  private val levels = mutable.ArrayBuffer.empty[Int]
  // links(node)(layer) = neighbor node indexes
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var maxLevel = -1

  def size: Int = ids.length

  private def dot(a: Array[Long], b: Array[Long]): Double = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s.toDouble
  }

  private def normOf(v: Array[Long]): Double = math.sqrt(dot(v, v))

  /** Quantized cosine of stored node `i` against (qv, qn). */
  private def sim(i: Int, qv: Array[Long], qn: Double): Double =
    dot(vecs(i), qv) / (norms(i) * qn)

  /** Deterministic level draw: the standard exponential distribution
    * floor(-ln(u) * mL), with u derived from a splitmix of the id.
    */
  private def levelOf(id: Long): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    val u = ((z >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
    math.floor(-math.log(u) * levelNorm).toInt
  }

  /** Greedy hill-climb at one layer: move to the best neighbor until no
    * neighbor improves (the upper-layer descent step of the paper).
    */
  private def greedy(start: Int, layer: Int, qv: Array[Long], qn: Double): Int = {
    var cur = start
    var curSim = sim(cur, qv, qn)
    var improved = true
    while (improved) {
      improved = false
      val ns = links(cur)(layer)
      var i = 0
      while (i < ns.length) {
        val s = sim(ns(i), qv, qn)
        if (s > curSim) { curSim = s; cur = ns(i); improved = true }
        i += 1
      }
    }
    cur
  }

  /** Beam search at one layer (Algorithm 2): expand the closest
    * unexpanded candidate, keep the best `ef` seen. Returns (node, sim)
    * best-first. `ef >= size` with a connected graph degenerates toward
    * an exhaustive walk — the exact mode the oracle gate uses.
    */
  private def beam(start: Int, layer: Int, ef: Int,
      qv: Array[Long], qn: Double): mutable.ArrayBuffer[(Int, Double)] = {
    val visited = new java.util.HashSet[Integer]()
    // candidates: max-heap by sim (expand best first)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](
      scala.math.Ordering.by(_._1))
    // result: min-heap by sim (evict worst)
    val res = mutable.PriorityQueue.empty[(Double, Int)](
      scala.math.Ordering.by[(Double, Int), Double](_._1).reverse)
    val s0 = sim(start, qv, qn)
    visited.add(start)
    cand.enqueue((s0, start))
    res.enqueue((s0, start))
    while (cand.nonEmpty) {
      val (cs, c) = cand.dequeue()
      // the best unexpanded candidate is worse than the worst kept
      // result and the beam is full: done
      if (res.size >= ef && cs < res.head._1) {
        cand.clear()
      } else {
        val ns = links(c)(layer)
        var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (!visited.contains(nb)) {
            visited.add(nb)
            val s = sim(nb, qv, qn)
            if (res.size < ef || s > res.head._1) {
              cand.enqueue((s, nb))
              res.enqueue((s, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.empty[(Int, Double)]
    while (res.nonEmpty) { val (s, n) = res.dequeue(); out += ((n, s)) }
    // sim desc, id asc on ties — matches the brute-force ranking's
    // tie-break so the exact mode hash-matches the oracle
    out.sortInPlace()(scala.math.Ordering.by[(Int, Double), (Double, Long)](
      p => (-p._2, ids(p._1))))
    out
  }

  /** Select up to `max` connections from beam results — the paper's
    * HEURISTIC selection (Algorithm 4; reference tok/hnsw/heuristic.go):
    * walk candidates best-first and keep one only if it is closer to the
    * query than to every already-kept neighbor. This spreads links
    * across directions instead of clustering them on one tight
    * neighborhood — the difference between a navigable graph and a
    * near-clique at high dimension/skew. Discarded candidates backfill
    * remaining slots (the keepPruned variant) so low-degree nodes stay
    * connected. Deterministic: input order is deterministic and the
    * rule is pure.
    */
  private def select(cands: mutable.ArrayBuffer[(Int, Double)],
      max: Int): mutable.ArrayBuffer[Int] = {
    val kept = mutable.ArrayBuffer.empty[Int]
    val pruned = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < cands.length && kept.length < max) {
      val (e, simToQ) = cands(i)
      val ev = vecs(e); val en = norms(e)
      var closerToKept = false
      var j = 0
      while (!closerToKept && j < kept.length) {
        if (dot(ev, vecs(kept(j))) / (en * norms(kept(j))) > simToQ)
          closerToKept = true
        j += 1
      }
      if (closerToKept) pruned += e else kept += e
      i += 1
    }
    var p = 0
    while (kept.length < max && p < pruned.length) {
      kept += pruned(p); p += 1
    }
    kept
  }

  def insert(id: Long, vec: Array[Long]): Unit = {
    val idx = ids.length
    val lvl = levelOf(id)
    ids += id
    vecs += vec
    norms += normOf(vec)
    levels += lvl
    links += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
    if (entry < 0) { entry = idx; maxLevel = lvl; return }
    val qn = norms(idx)
    var cur = entry
    // descend the layers above the node's level greedily
    var layer = maxLevel
    while (layer > lvl) {
      cur = greedy(cur, layer, vec, qn)
      layer -= 1
    }
    // connect on each layer from min(maxLevel, lvl) down to 0
    layer = math.min(maxLevel, lvl)
    while (layer >= 0) {
      val nearest = beam(cur, layer, efConstruction, vec, qn)
      val cap = if (layer == 0) mMax0 else m
      val chosen = select(nearest, m)
      links(idx)(layer) = chosen.clone()
      var i = 0
      while (i < chosen.length) {
        val nb = chosen(i)
        val nbLinks = links(nb)(layer)
        nbLinks += idx
        if (nbLinks.length > cap) {
          // prune the neighbor back to its cap, keeping its closest
          val qv2 = vecs(nb); val qn2 = norms(nb)
          val kept = nbLinks
            .map(x => (x, sim(x, qv2, qn2)))
            .sortBy(-_._2).take(cap).map(_._1)
          links(nb)(layer) = kept
        }
        i += 1
      }
      if (nearest.nonEmpty) cur = nearest.head._1
      layer -= 1
    }
    if (lvl > maxLevel) { maxLevel = lvl; entry = idx }
  }

  /** Serialize the graph: one row per node — (id, vector, level,
    * per-layer neighbor IDS). Neighbors are exported as ids, not shard-
    * local indexes, so the on-disk form is independent of row order;
    * [[HnswIndex.fromNodes]] re-resolves them after an id sort (the same
    * order [[insert]] was driven in, so indexes land identically).
    */
  def exportNodes: Iterator[(Long, Array[Long], Int, Seq[Seq[Long]])] =
    ids.indices.iterator.map { i =>
      (ids(i), vecs(i), levels(i),
        links(i).toSeq.map(layer => layer.toSeq.map(ids(_))))
    }

  /** k nearest stored nodes by quantized cosine: (id, sim), best first.
    * `ef` is the layer-0 beam width (clamped to >= k).
    */
  def search(vec: Array[Long], k: Int, ef: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Nil
    val qn = normOf(vec)
    // ef >= size IS an exhaustive scan — implement it as one so the
    // EXACT mode cannot depend on graph connectivity (layer-0 pruning
    // can in principle orphan a node; the oracle gate must not be
    // hostage to that). The approximate regime below never hits this.
    if (ef >= size) {
      val all = Array.tabulate(size)(i => (i, sim(i, vec, qn)))
      return all.sortBy(p => (-p._2, ids(p._1)))
        .take(k).map { case (i, s) => (ids(i), s) }.toSeq
    }
    var cur = entry
    var layer = maxLevel
    while (layer > 0) {
      cur = greedy(cur, layer, vec, qn)
      layer -= 1
    }
    beam(cur, 0, math.max(ef, k), vec, qn)
      .take(k).map { case (i, s) => (ids(i), s) }.toSeq
  }
}

object HnswIndex {

  /** Rebuild an index from [[HnswIndex.exportNodes]] rows WITHOUT paying
    * construction (no beam searches, no pruning — just adjacency fill).
    * This is the search-many half of build-once/search-many: loading a
    * persisted shard is a linear pass over its rows.
    *
    * The entry point is re-derived, not stored: during construction the
    * entry only changes when a node's level EXCEEDS the running max, and
    * insertion is id-sorted — so the final entry is the first node in id
    * order whose level equals the global maximum.
    */
  def fromNodes(m: Int, efConstruction: Int,
      nodes: Array[(Long, Array[Long], Int, Seq[Seq[Long]])]): HnswIndex = {
    val idx = new HnswIndex(m, efConstruction)
    val sorted = nodes.sortBy(_._1)
    val id2i = new java.util.HashMap[Long, Integer](sorted.length * 2)
    var i = 0
    while (i < sorted.length) { id2i.put(sorted(i)._1, i); i += 1 }
    sorted.foreach { case (id, vec, lvl, nbs) =>
      idx.ids += id
      idx.vecs += vec
      idx.norms += idx.normOf(vec)
      idx.levels += lvl
      idx.links += nbs.map(layer =>
        mutable.ArrayBuffer.from(layer.map(n => id2i.get(n).intValue()))).toArray
      if (lvl > idx.maxLevel) {
        idx.maxLevel = lvl
        idx.entry = idx.ids.length - 1
      }
    }
    idx
  }
}
