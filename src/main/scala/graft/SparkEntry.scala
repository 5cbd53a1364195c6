package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` key per implemented operator from SURVEY.md §2 (plus the
  * mandated LLM-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every oracle-expressible key. Keys without an oracle
  * (approx sketches, engine-specific hashing, mapPartitions plumbing) get
  * the driver's weaker rows-only check by design.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.joinMultiwayStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ Functions.queries ++ Streaming.queries ++
      Udafs.queries ++ Astro.queries ++ Llm.queries ++ Graph.queries ++
      Observability.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Joins.oracle ++ Aggregates.oracle ++
      Windows.oracle ++ Functions.oracle ++ Streaming.oracle ++
      Udafs.oracle ++ Astro.oracle ++ Llm.oracle ++ Graph.oracle ++
      Observability.oracle ++ Pipeline.oracle
}
