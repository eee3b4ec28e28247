package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to Spark
  * plans over the driver's parquet tables; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, Q.QFn], Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracles),
    (GraphQueries.queries, GraphQueries.oracles),
    (LlmQueries.queries, LlmQueries.oracles),
    (QualityQueries.queries, QualityQueries.oracles),
    (DqlQueries.queries, DqlQueries.oracles),
    (MutationQueries.queries, MutationQueries.oracles),
    (SpecialQueries.queries, SpecialQueries.oracles),
    (GraphqlQueries.queries, GraphqlQueries.oracles)
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
