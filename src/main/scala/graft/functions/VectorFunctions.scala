package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns (reference
  * float32vector, types/scalar_types.go:60; distance metrics
  * tok/hnsw/helper.go).
  *
  * Two tiers:
  *  - `cosineQ`/`dotQ`: quantized-int arithmetic (round(x*1000) per
  *    element). Integer sums are associative, so results are
  *    bit-identical across engines and partitionings — these back the
  *    DuckDB-oracled queries and any dedup decision that must be
  *    reproducible at 100 TB (a re-run must dedup the same pairs).
  *  - `cosineF`/`dotF`: plain double-precision folds for interactive
  *    similarity search where last-ulp reproducibility doesn't matter.
  *
  * All are codegen'd higher-order expressions; a pair-join using them
  * stays inside WholeStageCodegen.
  */
object VectorFunctions {

  /** Quantize: per-element round(double(x) * 1000) as long. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd expression (see plans.DotProductLong); identical math to
    * the higher-order `aggregate(zip_with(...))` fold it replaces.
    */
  def dotQ(a: Column, b: Column): Column =
    graft.plans.DotProductLong(a, b)

  /** Exact integer squared norm. */
  def normQ(a: Column): Column =
    graft.plans.DotProductLong(a, a)

  /** Deterministic cosine over quantized vectors: exact int dot/norms,
    * one double division at the end (same op order as the oracle SQL).
    */
  def cosineQ(qa: Column, qb: Column): Column =
    dotQ(qa, qb).cast("double") /
      (sqrt(normQ(qa).cast("double")) * sqrt(normQ(qb).cast("double")))

  /** Float-precision dot / cosine / euclidean for non-oracled paths. */
  def dotF(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))

  def euclideanF(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double"); diff * diff
    }), lit(0.0), (acc, x) => acc + x))
}
