package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch mutation semantics (reference §2.11): set/delete N-Quads, upsert
  * blocks with @if conditions, blank-node uid allocation, @unique
  * enforcement (/root/reference/dql/parser_mutation.go,
  * edgraph/server.go:575 doMutate, :1776 verifyUnique,
  * query/mutation.go:187 AssignUids).
  *
  * The reference routes mutations through Raft + posting-list deltas; the
  * Spark engine replaces that with deterministic DataFrame merges and a
  * table-version swap on write (write-new-parquet-then-repoint). Every
  * merge below is a single shuffle on (subject, predicate) — at 100 TB
  * the base table is bucketed on subject so the anti-join co-partitions.
  */
object Mutations {

  /** `set` semantics for scalar predicates: new values replace existing
    * (subject, predicate) rows — anti-join out overwritten rows, union
    * the new triples.
    */
  def applySet(base: DataFrame, sets: DataFrame): DataFrame =
    base.join(sets.select("subject", "predicate"), Seq("subject", "predicate"), "left_anti")
      .unionByName(sets)

  /** `delete` semantics incl. wildcards (reference `S P *` and `S * *`,
    * posting/index.go:372): deletes carry (subject, predicate) with
    * predicate = "*" meaning all predicates of the subject.
    */
  def applyDelete(base: DataFrame, deletes: DataFrame): DataFrame = {
    val starSubjects = deletes.filter(col("predicate") === "*").select("subject")
    val exact = deletes.filter(col("predicate") =!= "*").select("subject", "predicate")
    base.join(starSubjects, Seq("subject"), "left_anti")
      .join(exact, Seq("subject", "predicate"), "left_anti")
  }

  /** Triple-precise delete (reference S P O deletion, edgraph mutation
    * path): rows carry (subject, predicate, objectUid, value) where
    *  - predicate "*"            → drop the whole node (S * *),
    *  - null objectUid AND value → drop every value of the predicate
    *                               (S P *),
    *  - non-null objectUid       → drop just that edge,
    *  - non-null value           → drop just that literal triple.
    * Each arm is one anti-join on its own key — same shuffle shape as
    * [[applyDelete]], still co-partitioned when the base is bucketed on
    * subject.
    */
  def applyDeleteTriples(base: DataFrame, deletes: DataFrame): DataFrame = {
    val star = deletes.filter(col("predicate") === "*").select("subject")
    val whole = deletes.filter(col("predicate") =!= "*" &&
        col("objectUid").isNull && col("value").isNull)
      .select("subject", "predicate")
    val exactObj = deletes.filter(col("objectUid").isNotNull)
      .select("subject", "predicate", "objectUid")
    val exactVal = deletes.filter(col("value").isNotNull)
      .select("subject", "predicate", "value")
    base.join(star, Seq("subject"), "left_anti")
      .join(whole, Seq("subject", "predicate"), "left_anti")
      .join(exactObj, Seq("subject", "predicate", "objectUid"), "left_anti")
      .join(exactVal, Seq("subject", "predicate", "value"), "left_anti")
  }

  /** Upsert: run the query block to bind `v`, apply the conditional
    * mutation only when `cond(len(v))` holds (reference @if(eq(len(v),N)),
    * dql/parser_mutation.go:105). The length check is a driver-side
    * scalar — identical to the reference, which evaluates @if on the
    * server before proposing.
    */
  def upsert(base: DataFrame, varUids: DataFrame, cond: Long => Boolean,
      mutation: DataFrame => DataFrame): DataFrame = {
    val n = varUids.count()
    if (cond(n)) mutation(base) else base
  }

  /** Allocate fresh uids for blank nodes: contiguous after the current
    * max uid, ordered deterministically by the blank label. The max is
    * computed distributed and broadcast (a 1-row cross join), never
    * collected row-by-row.
    *
    * Allocation is the partition-offset pattern (SURVEY §2.1): a range
    * repartition by label makes partitions contiguous label slices, each
    * partition ranks its own slice, and a metadata-sized per-partition
    * count prefix-sum turns local ranks into the global rank. A single
    * global `Window.orderBy(label)` would funnel every blank node through
    * one reducer — a driver-adjacent bottleneck when a bulk load allocates
    * 10⁹ uids; this plan's only data-sized exchange is the range
    * partitioning itself. Result is identical: uid = max + rank(label).
    */
  def allocateUids(blanks: DataFrame, labelCol: String,
      existingUids: DataFrame): DataFrame = {
    val maxUid = existingUids.agg(max(col("subject")).as("__max"))
    // checkpoint so the two consumers (offsets, join) see ONE consistent
    // partition assignment and the range shuffle runs once; LAZY — the
    // single materialization rides the first consumer's action instead
    // of running as its own blocking job in the mutation chain (both
    // consumers read the same cached RDD either way)
    val parted = blanks.repartitionByRange(col(labelCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false)
    val local = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(col(labelCol)))
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    parted.withColumn("__local", local.cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(maxUid))
      .withColumn("uid", col("__max") + col("__off") + col("__local"))
      .drop("__pid", "__local", "__off", "__max")
  }

  /** Live loader (reference dgraph/cmd/live: chunk → parse → assign uids
    * for blanks → mutate): parse N-Quad lines (uid or `_:blank`
    * subjects), allocate fresh uids for the distinct blank labels after
    * the current max, resolve, and merge into `base` with set semantics.
    * One batch = one call; the chunked file reader is Spark's own text
    * source, so a 100 TB load is just more partitions of `lines`.
    */
  def liveLoad(lines: DataFrame, base: DataFrame,
      existingUids: DataFrame): DataFrame = {
    val parsed = graft.sources.RdfSource.parseWithBlanks(lines)
    val blanks = parsed.filter(col("subjectBlank").isNotNull)
      .select(col("subjectBlank").as("label")).distinct()
    val alloc = allocateUids(blanks, "label", existingUids)
      .select(col("label").as("__bl"), col("uid").as("__bu"))
    val resolved = parsed
      .join(alloc, col("subjectBlank") === col("__bl"), "left")
      .select(coalesce(col("subjectUid"), col("__bu")).as("subject"),
        col("predicate"), col("value"), col("lang"))
    applySet(base, resolved)
  }

  /** @unique pre-commit check (reference verifyUnique): proposed triples
    * whose value already exists for the predicate are rejected.
    * Returns (accepted, rejected).
    */
  def uniqueCheck(base: DataFrame, proposed: DataFrame): (DataFrame, DataFrame) = {
    val existing = base.select("predicate", "value").distinct()
    val rejected = proposed.join(existing, Seq("predicate", "value"), "left_semi")
    val accepted = proposed.join(existing, Seq("predicate", "value"), "left_anti")
    (accepted, rejected)
  }
}
