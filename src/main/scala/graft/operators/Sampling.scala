package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys on a salted md5 of the row id — NOT `rand()` — so a
  * re-run over re-partitioned (or incrementally grown) data assigns
  * every row the same split. That determinism is the property that
  * matters at 100 TB: the train/valid/test membership of a document must
  * survive pipeline re-runs, backfills, and engine migrations (md5 is
  * bit-identical across Spark, DuckDB, and any other engine). All
  * operators are single-pass, shuffle-free row-local projections.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the salted md5 of the id. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

  /** Train/valid/test split labels with the given percentages
    * (must sum to 100). A row's label is a pure function of
    * (salt, id).
    */
  def split(df: DataFrame, id: Column, salt: String,
      trainPct: Int = 90, validPct: Int = 5): DataFrame = {
    require(trainPct + validPct <= 100, "split percentages exceed 100")
    val b = hashBucket(id, salt, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic p% sample: keep rows whose hash bucket falls under
    * `pct`. Growing `pct` only ADDS rows (nested samples — a 10% sample
    * is a subset of the 20% sample), which is what iterative scaling
    * experiments need.
    */
  def sample(df: DataFrame, id: Column, salt: String, pct: Int): DataFrame =
    df.filter(hashBucket(id, salt, 100) < pct)

  /** Per-stratum deterministic sampling: one rate per stratum value
    * (e.g. downsample common languages, keep all of rare ones).
    * Unlisted strata fall back to `defaultPct`.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      salt: String, rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(stratum === k, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(id, salt, 100) < pct)
  }

  /** Mixture sampling to per-stratum TOKEN budgets (the pretraining
    * mixture knob: "x tokens of source A, y of source B"): each
    * stratum's keep-rate = min(1, budget / its total tokens), quantized
    * to basis points with exact integer arithmetic, applied as the same
    * deterministic nested-hash filter — re-running with a bigger budget
    * only ADDS documents. 100 TB shape: the stratum totals are the only
    * driver action and are metadata-sized (one row per source); the
    * sample itself is one scan + filter with no shuffle.
    */
  def mixtureByTokens(df: DataFrame, id: Column, stratum: Column,
      tokens: Column, salt: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val totals = df.groupBy(stratum.as("__s"))
      .agg(sum(tokens).as("__tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def bps(k: String): Long = {
      val tot = totals.getOrElse(k, 0L)
      val b = budgets.getOrElse(k, defaultBudget)
      if (tot == 0L) 0L else math.min(10000L, b * 10000L / tot)
    }
    val rate = totals.keys.toSeq.sorted.foldLeft(lit(0L)) { case (acc, k) =>
      when(stratum === k, lit(bps(k))).otherwise(acc)
    }
    df.filter(hashBucket(id, salt, 10000) < rate)
  }
}
