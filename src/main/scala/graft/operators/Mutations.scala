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
    */
  def allocateUids(blanks: DataFrame, labelCol: String,
      existingUids: DataFrame): DataFrame = {
    val maxUid = existingUids.agg(max(col("subject")).as("__max"))
    val w = Window.orderBy(col(labelCol))
    blanks.crossJoin(broadcast(maxUid))
      .withColumn("uid", col("__max") + row_number().over(w).cast("long"))
      .drop("__max")
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
