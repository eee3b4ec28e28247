package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** ANN recall check in the spirit of the reference's HNSW recall tests
  * (tok/hnsw/ef_recall_test.go): approximate search must recover the
  * true nearest neighbor of near-duplicate queries at high rate.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("LSH top-1 recovers designed near-duplicates with recall >= 0.8") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
    // queries: perturbed copies (id + 1e6) whose true NN is the original
    val perturbed = emb.select(($"vec_id" + 1000000L).as("id"),
      transform($"embedding",
        x => round((x.cast("double") * 1.05 + 0.01) * 1000).cast("long")).as("qe"))
    val hits = Similarity.lshTopK(perturbed, base, k = 1, dim = 64)
      .filter($"rank" === 1 && $"nid" === $"qid" - 1000000L)
      .count()
    val total = base.count()
    val recall = hits.toDouble / total
    info(s"LSH top-1 recall on near-dups: $recall ($hits/$total)")
    assert(recall >= 0.8, s"recall $recall below 0.8")
  }

  test("LSH recall sweeps up with probe radius (ef_recall parity curve)") {
    // the reference trades search breadth (ef) for recall,
    // tok/hnsw/ef_recall_test.go; here the knob is the multi-probe
    // hamming radius — recall must be monotone in it and high at 2
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
    val perturbed = emb.select(($"vec_id" + 1000000L).as("id"),
      transform($"embedding",
        x => round((x.cast("double") * 1.05 + 0.01) * 1000).cast("long")).as("qe"))
    val total = base.count().toDouble
    val recalls = Seq(0, 1, 2).map { probe =>
      val hits = Similarity.lshTopK(perturbed, base, k = 1, dim = 64,
          probe = probe)
        .filter($"rank" === 1 && $"nid" === $"qid" - 1000000L)
        .count()
      val r = hits / total
      info(f"probe=$probe recall=$r%.3f")
      r
    }
    assert(recalls == recalls.sorted, s"recall not monotone in probe: $recalls")
    assert(recalls.last >= 0.9, s"probe=2 recall ${recalls.last} below 0.9")
  }

  test("LSH candidates are a strict subset of brute force work") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
    val sigs = Similarity.withLshSignature(base, dim = 64, planes = 8)
    val buckets = sigs.groupBy($"sig").count()
    val nBuckets = buckets.count()
    val maxBucket = buckets.agg(max($"count")).head.getLong(0)
    info(s"buckets=$nBuckets maxBucket=$maxBucket of ${base.count()}")
    assert(nBuckets > 10)             // signatures actually spread
    assert(maxBucket < base.count())  // no degenerate single bucket
  }

  test("trained IVF: recall@10 vs brute force is monotone in probes, exact at full probe") {
    // recall-parity story vs the reference's HNSW (tok/hnsw/
    // ef_recall_test.go): the tunable-breadth knob here is `probes`
    // (cells scanned), as ef is there. The synthetic embeddings are
    // uniform random — the ADVERSARIAL case for any ANN index (no
    // cluster structure) — so the thresholds below are worst-case
    // floors; clustered real-world embeddings do far better.
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 20 === 0).localCheckpoint()
    val k = 10
    val truth = Similarity.bruteForceTopK(queries, base, k)
      .select($"qid", $"nid").withColumnRenamed("nid", "tn").localCheckpoint()
    val denom = truth.count().toDouble
    val cents = Similarity.trainIvfCentroids(base, nCells = 16)
    val recalls = Seq(2, 4, 8, 16).map { probes =>
      val approx = Similarity.ivfSearchTopK(queries, base, k, cents, probes)
        .select($"qid", $"nid")
      val r = truth.join(approx, Seq("qid")).filter($"tn" === $"nid").count() / denom
      info(f"ivf probes=$probes recall@$k = $r%.3f")
      r
    }
    assert(recalls == recalls.sorted, s"recall not monotone in probes: $recalls")
    assert(recalls(2) >= 0.75, s"probes=8 recall ${recalls(2)} below 0.75")
    // scanning every cell IS brute force: the index must lose nothing
    assert(recalls.last == 1.0, s"full-probe recall ${recalls.last} != 1.0")
  }

  test("trained IVF centroids are deterministic across repartitionings") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
    val c1 = Similarity.trainIvfCentroids(base, nCells = 8, iters = 2)
    val c2 = Similarity.trainIvfCentroids(base.repartition(13), nCells = 8, iters = 2)
    assert(c1 == c2)
  }

  test("persisted IVF index searches identically to the direct path") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 25 === 0)
    val dir = "target/spec-ivf-index"
    val cents = Similarity.ivfWrite(base, dir, nCells = 8, iters = 2)
    val (stored, loaded) = Similarity.ivfRead(spark, dir)
    assert(loaded == cents) // centroid metadata round-trips exactly
    // partial probes: stored-index search == direct search, row for row
    val direct = Similarity.ivfSearchTopK(queries, base, 3, cents, probes = 2)
      .select($"qid", $"nid", $"rank").collect().toSet
    val viaIndex = Similarity.ivfSearchStored(queries, stored, 3, loaded, probes = 2)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(viaIndex == direct)
  }

  test("HNSW: recall@10 vs brute force is monotone in ef, exact at ef >= shard") {
    // the reference's own knob (tok/hnsw/ef_recall_test.go): search
    // breadth ef trades cost for recall. Same worst-case setup as the
    // IVF suite: uniform random vectors, no cluster structure. One
    // shard so the recall measured is the GRAPH's, not the merge's.
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 20 === 0).localCheckpoint()
    val k = 10
    val truth = Similarity.bruteForceTopK(queries, base, k)
      .select($"qid", $"nid").withColumnRenamed("nid", "tn").localCheckpoint()
    val denom = truth.count().toDouble
    val n = base.count().toInt
    val recalls = Seq(16, 48, 128, n).map { ef =>
      val approx = Similarity.hnswTopK(queries, base, k,
          efSearch = ef, nPartitions = 1)
        .select($"qid", $"nid")
      val r = truth.join(approx, Seq("qid")).filter($"tn" === $"nid").count() / denom
      info(f"hnsw ef=$ef recall@$k = $r%.3f")
      r
    }
    assert(recalls == recalls.sorted, s"recall not monotone in ef: $recalls")
    assert(recalls(1) >= 0.6, s"ef=48 recall ${recalls(1)} below 0.6")
    // ef >= shard size is the exhaustive exact mode
    assert(recalls.last == 1.0, s"ef=n recall ${recalls.last} != 1.0")
  }

  test("HNSW: sharded search (4 partitions) at full ef equals brute force exactly") {
    // per-shard exact top-k merged by the bounded-heap aggregate must
    // reproduce global brute force row for row — the merge loses nothing
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(queries, base, 5)
      .select($"qid", $"nid", $"rank").collect().toSet
    val sharded = Similarity.hnswTopK(queries, base, 5,
        efSearch = Int.MaxValue, nPartitions = 4)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(sharded == exact)
  }

  test("HNSW: persisted shard layout round-trips and searches equal the live graph") {
    // build-once/search-many: exportNodes -> parquet -> fromNodes must
    // reproduce the SAME graphs (adjacency copied, not reconstructed),
    // so stored search == live search at every ef, and the exact mode
    // matches brute force
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 25 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_spec")
      .toFile.getAbsolutePath
    Similarity.hnswWrite(base, dir, nPartitions = 4)
    // approximate regime: stored equals live (same graphs, same walks)
    val live = Similarity.hnswTopK(queries, base, 5,
        efSearch = 32, nPartitions = 4)
      .select($"qid", $"nid", $"rank").collect().toSet
    val stored = Similarity.hnswSearchStored(queries, spark, dir, 5,
        efSearch = 32)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(stored == live)
    // exact mode over the stored layout matches brute force
    val exact = Similarity.bruteForceTopK(queries, base, 5)
      .select($"qid", $"nid", $"rank").collect().toSet
    val storedExact = Similarity.hnswSearchStored(queries, spark, dir, 5,
        efSearch = Int.MaxValue)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(storedExact == exact)
  }

  test("HNSW: incremental upsert/delete maintain the stored layout without rebuild") {
    // the LSM shape (reference posting/index.go:585 AddMutationWithIndex
    // keeps vector postings current with every write): sealed base
    // shards + delta/tombstone segments. Exact-mode search over the
    // mutated layout must equal brute force over the mutated corpus,
    // through every ordering case: insert, replace, re-replace,
    // delete-of-base, delete-after-upsert.
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 25 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_mut")
      .toFile.getAbsolutePath
    Similarity.hnswWrite(base, dir, nPartitions = 4)
    val v0 = base.filter($"id" === 0)
    // batch 1: insert a new id, replace id 3
    Similarity.hnswUpsert(spark, dir,
      v0.select(lit(900001L).as("id"), transform($"qe", x => x * 2).as("qe"))
        .unionByName(
          v0.select(lit(3L).as("id"), transform($"qe", x => -x).as("qe"))))
    // batch 2: re-replace id 3 (latest write must win), delete id 7
    Similarity.hnswUpsert(spark, dir,
      v0.select(lit(3L).as("id"), transform($"qe", x => x * 3).as("qe")))
    Similarity.hnswDelete(spark, dir, v0.select(lit(7L).as("id")))
    // batch 3: upsert id 11 then delete it — the delete must cover the
    // newer delta row too
    Similarity.hnswUpsert(spark, dir,
      v0.select(lit(11L).as("id"), transform($"qe", x => x * 5).as("qe")))
    Similarity.hnswDelete(spark, dir, v0.select(lit(11L).as("id")))
    val mutated = base.filter(!$"id".isin(3L, 7L, 11L))
      .unionByName(v0.select(lit(900001L).as("id"),
        transform($"qe", x => x * 2).as("qe")))
      .unionByName(v0.select(lit(3L).as("id"),
        transform($"qe", x => x * 3).as("qe")))
      .localCheckpoint()
    val exact = Similarity.bruteForceTopK(queries, mutated, 5)
      .select($"qid", $"nid", $"rank").collect().toSet
    val storedExact = Similarity.hnswSearchStored(queries, spark, dir, 5,
        efSearch = Int.MaxValue)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(storedExact == exact)
  }

  test("IVF: incremental upsert/delete maintain the stored layout without rebuild") {
    // same delta/tombstone contract as the HNSW test, through the same
    // ordering cases: insert, replace, re-replace, delete-of-base,
    // delete-after-upsert. Full probe = exact, so the mutated layout
    // must equal brute force over the mutated corpus row for row.
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 25 === 0)
      .select(($"id" - 1000000L).as("id"), $"qe") // ids disjoint from corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_mut")
      .toFile.getAbsolutePath
    Similarity.ivfWrite(base, dir, nCells = 8)
    val v0 = base.filter($"id" === 0)
    Similarity.ivfUpsert(spark, dir,
      v0.select(lit(900001L).as("id"), transform($"qe", x => x * 2).as("qe"))
        .unionByName(
          v0.select(lit(3L).as("id"), transform($"qe", x => -x).as("qe"))))
    Similarity.ivfUpsert(spark, dir,
      v0.select(lit(3L).as("id"), transform($"qe", x => x * 3).as("qe")))
    Similarity.ivfDelete(spark, dir, v0.select(lit(7L).as("id")))
    Similarity.ivfUpsert(spark, dir,
      v0.select(lit(11L).as("id"), transform($"qe", x => x * 5).as("qe")))
    Similarity.ivfDelete(spark, dir, v0.select(lit(11L).as("id")))
    val mutated = base.filter(!$"id".isin(3L, 7L, 11L))
      .unionByName(v0.select(lit(900001L).as("id"),
        transform($"qe", x => x * 2).as("qe")))
      .unionByName(v0.select(lit(3L).as("id"),
        transform($"qe", x => x * 3).as("qe")))
      .localCheckpoint()
    val exact = Similarity.bruteForceTopK(queries, mutated, 5)
      .select($"qid", $"nid", $"rank").collect().toSet
    val live = Similarity.ivfSearchLive(queries, spark, dir, 5, probes = 8)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(live == exact)
  }

  test("PQ exact mode: bounded-cardinality codebooks make ADC search equal brute force") {
    // per-subspace cardinality <= 35 by construction: exact codebooks
    // encode losslessly, so ADC == true distance and PQ == brute force,
    // row for row — for BOTH metrics (the oracle gate rides dotproduct)
    val base = (0L until 400L).map { id =>
      (id, Seq(1 + (id * 3) % 5, id % 7, 1 + (id * 5) % 5, (id + 2) % 7,
        1 + (id * 7) % 5, (id + 4) % 7, 1 + (id * 11) % 5, (id + 6) % 7))
    }.toDF("id", "qe").localCheckpoint()
    val queries = base.filter($"id" % 40 === 0)
    val books = Similarity.pqCodebooksExact(base, m = 4)
    assert(books.forall(_.size <= 35))
    val enc = Similarity.pqEncode(base, books).localCheckpoint()
    for (metric <- Seq("dotproduct", "cosine")) {
      val scoreCol = if (metric == "dotproduct") "dot" else "sim"
      val pq = Similarity.pqSearchTopK(queries, enc, 5, books, metric)
        .select($"qid", $"nid", col(scoreCol), $"rank").collect().toSet
      val bf = Similarity.bruteForceTopKMetric(queries, base, 5, metric)
        .select($"qid", $"nid", col(scoreCol), $"rank").collect().toSet
      assert(pq == bf, s"PQ exact mode != brute force for $metric")
    }
  }

  test("PQ k-means regime: recall@10 on real embeddings, monotone in ksub") {
    // uniform-random embeddings are the adversarial case (no cluster
    // structure); floors are conservative. More codewords = finer
    // quantization = higher recall, the PQ analogue of the ef/probes
    // knob sweeps above.
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 20 === 0).localCheckpoint()
    val k = 10
    val truth = Similarity.bruteForceTopK(queries, base, k)
      .select($"qid", $"nid").withColumnRenamed("nid", "tn").localCheckpoint()
    val denom = truth.count().toDouble
    val recalls = Seq(16, 64).map { ksub =>
      val books = Similarity.pqTrain(base, m = 16, ksub = ksub, iters = 2)
      val enc = Similarity.pqEncode(base, books)
      val approx = Similarity.pqSearchTopK(queries, enc, k, books)
        .select($"qid", $"nid")
      val r = truth.join(approx, Seq("qid")).filter($"tn" === $"nid").count() / denom
      info(f"pq m=16 ksub=$ksub recall@$k = $r%.3f")
      r
    }
    assert(recalls == recalls.sorted, s"recall not monotone in ksub: $recalls")
    assert(recalls.last >= 0.5, s"ksub=64 recall ${recalls.last} below 0.5")
  }

  test("PQ: training is deterministic, persisted index round-trips and searches identically") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val b1 = Similarity.pqTrain(base, m = 8, ksub = 8, iters = 2)
    val b2 = Similarity.pqTrain(base.repartition(13), m = 8, ksub = 8, iters = 2)
    assert(b1 == b2) // same seeds + same sums regardless of layout
    val dir = "target/spec-pq-index"
    Similarity.pqWrite(base, dir, b1)
    val (codes, loaded) = Similarity.pqRead(spark, dir)
    assert(loaded == b1) // codebook metadata round-trips exactly
    // stored codes carry NO raw vectors — the compression is structural
    assert(codes.columns.toSeq == Seq("id", "codes"))
    val queries = base.filter($"id" % 25 === 0)
    val direct = Similarity.pqSearchTopK(queries,
      Similarity.pqEncode(base, b1), 3, b1)
      .select($"qid", $"nid", $"rank").collect().toSet
    val viaIndex = Similarity.pqSearchTopK(queries, codes, 3, loaded)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(viaIndex == direct)
  }

  test("IVF-PQ: stored layout round-trips; full probe + exact books == brute force; partial probe prunes") {
    val base = (0L until 400L).map { id =>
      (id, Seq(1 + (id * 3) % 5, id % 7, 1 + (id * 5) % 5, (id + 2) % 7,
        1 + (id * 7) % 5, (id + 4) % 7, 1 + (id * 11) % 5, (id + 6) % 7))
    }.toDF("id", "qe").localCheckpoint()
    val queries = base.filter($"id" % 40 === 0)
    val cents = Similarity.trainIvfCentroids(base, nCells = 4, iters = 2)
    val books = Similarity.pqCodebooksExact(base, m = 4)
    val dir = "target/spec-ivfpq-index"
    Similarity.ivfPqWrite(base, dir, cents, books)
    val (stored, lc, lb) = Similarity.ivfPqRead(spark, dir)
    assert(lc == cents && lb == books)
    // the stored frame is cell + codes only — no raw vectors on disk
    assert(stored.columns.toSet == Set("id", "cell", "codes"))
    // full probe + exact codebooks: ADC == true dot == brute force
    val full = Similarity.ivfPqSearchStored(queries, stored, 5, lc, lb,
      probes = 4, metric = "dotproduct")
      .select($"qid", $"nid", $"dot", $"rank").collect().toSet
    val bf = Similarity.bruteForceTopKMetric(queries, base, 5, "dotproduct")
      .select($"qid", $"nid", $"dot", $"rank").collect().toSet
    assert(full == bf)
    // partial probe returns a subset of the full-probe candidates per query
    val partial = Similarity.ivfPqSearchStored(queries, stored, 5, lc, lb,
      probes = 1, metric = "dotproduct").select($"qid", $"nid").collect().toSet
    val fullPairs = Similarity.ivfPqSearchStored(queries, stored, 5, lc, lb,
      probes = 4, metric = "dotproduct").select($"qid", $"nid").collect().toSet
    assert(partial.nonEmpty)
    info(s"probe1 kept ${partial.size} of ${fullPairs.size} full-probe results")
  }

  test("HNSW: deterministic across repartitionings and rebuilds") {
    // hash-derived levels + id tie-breaks: the same shard contents give
    // the same graph and the same approximate results on every rebuild
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), quantize($"embedding").as("qe"))
      .localCheckpoint()
    val queries = base.filter($"id" % 50 === 0)
    def run() = Similarity.hnswTopK(queries, base, 3,
        efSearch = 32, nPartitions = 2)
      .select($"qid", $"nid", $"rank").collect().toSet
    assert(run() == run())
  }

  test("banded near-dup: subset of all-pairs, twin recall >= 0.8, balanced buckets") {
    val emb = Tables.load(spark, sf, "embeddings")
    val base = emb.select($"vec_id".as("id"), $"label".as("cell"),
      quantize($"embedding").as("qe"))
    val twins = emb.select(($"vec_id" + 1000000L).as("id"),
      $"label".as("cell"),
      transform($"embedding",
        x => round((x.cast("double") * 1.05 + 0.01) * 1000).cast("long")).as("qe"))
    val corpus = base.unionByName(twins)
    val all = Similarity.nearDupPairs(corpus, 0.95)
      .select($"a", $"b").collect().toSet
    val banded = Similarity.nearDupPairsBanded(corpus, 0.95, dim = 64)
      .select($"a", $"b").collect().toSet
    // every banded pair is a true pair (the verify step is exact)
    assert(banded.subsetOf(all), (banded -- all).take(3))
    // designed twins agree on most hyperplane signs — banding keeps them
    val twinPairs = all.filter { case r =>
      r.getLong(1) == r.getLong(0) + 1000000L }
    val kept = banded.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(twinPairs.nonEmpty &&
      kept >= (twinPairs.size * 0.8).toInt, s"$kept of ${twinPairs.size}")
    // the hyperplanes must actually split: no band bucket may hold the
    // bulk of a cell (the r15 parity-hash bug collapsed every band to
    // two buckets and went QUADRATIC)
    import graft.operators.Similarity.hyperplaneSign
    val sgn0 = (0 until 64).map(i => hyperplaneSign(0, 0, i))
    assert(math.abs(sgn0.sum) < 32, s"degenerate hyperplane: $sgn0")
    assert((0 until 8).map(j => (0 until 64).map(i =>
      hyperplaneSign(0, j, i))).distinct.size == 8, "duplicate hyperplanes")
  }

  test("nearDup hybrid default: exact ≡ on bounded cells, banded-subset on large") {
    // exact all-pairs (nearDupPairs) is retained ONLY as the
    // bounded-input verifier for the public nearDup operator
    val emb = Tables.load(spark, sf, "embeddings")
    def corpus(cell: org.apache.spark.sql.Column) = {
      val base = emb.select($"vec_id".as("id"), $"label", quantize($"embedding").as("qe"))
      val twins = emb.select(($"vec_id" + 1000000L).as("id"), $"label",
        transform($"embedding",
          x => round((x.cast("double") * 1.05 + 0.01) * 1000).cast("long")).as("qe"))
      base.unionByName(twins).withColumn("cell", cell).drop("label")
    }
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // 1. all cells bounded (occ 25 ≤ cap 32) → pure exact path, bit-equal
    val bounded = corpus(($"id" % 1000000L) % 40)
    val exactB = pairSet(Similarity.nearDupPairs(bounded, 0.95))
    assert(exactB.nonEmpty, "fixture lost its twin pairs")
    assert(pairSet(Similarity.nearDup(bounded, 0.95, dim = 64)) == exactB)

    // 2. mixed: label 0 split into 4 small cells (~28 each ≤ 32), labels
    //    1-9 stay whole (~86-126 each > 32) → hybrid split
    val mixed = corpus(when($"label" === 0, lit(100L) + $"id" % 4)
      .otherwise($"label".cast("long")))
    val occ = mixed.groupBy($"cell").count().collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(occ.values.exists(_ > 32) && occ.values.exists(_ <= 32),
      s"fixture must exercise both branches: $occ")
    val smallCells = occ.filter(_._2 <= 32).keySet
    val cellOf = mixed.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hybrid = pairSet(Similarity.nearDup(mixed, 0.95, dim = 64))
    val exact = pairSet(Similarity.nearDupPairs(mixed, 0.95))
    // verify step is exact cosine → never a false positive
    assert(hybrid.subsetOf(exact), (hybrid -- exact).take(3))
    // small cells run all-pairs → FULL recall there
    val smallExact = exact.filter(p => smallCells(cellOf(p._1)))
    assert(hybrid.filter(p => smallCells(cellOf(p._1))) == smallExact)
    // designed twins survive banding on the large cells too
    val twinsAll = exact.count(p => p._2 == p._1 + 1000000L)
    val twinsKept = hybrid.count(p => p._2 == p._1 + 1000000L)
    assert(twinsKept >= (twinsAll * 0.8).toInt, s"$twinsKept of $twinsAll")

    // 3. bits auto-scale: smallest b in range with maxOcc ≤ cap·2^b
    assert(Similarity.chooseBits(32, 32, 4, 12) == 4)
    assert(Similarity.chooseBits(512, 32, 4, 12) == 4)
    assert(Similarity.chooseBits(513, 32, 4, 12) == 5)
    assert(Similarity.chooseBits(4360, 32, 4, 12) == 8)
    assert(Similarity.chooseBits(Long.MaxValue / 2, 32, 4, 12) == 12)
  }
}
