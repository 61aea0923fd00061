package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per SURVEY §2 operator; `oracleSql` holds the
  * DuckDB-dialect twin for every hash-comparable query (non-deterministic
  * or sink-shaped operators are deliberately omitted and covered by the
  * ScalaTest suite instead — see SURVEY §5).
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Joins.queries ++ Aggs.queries ++ Windows.queries ++
      SetOps.queries ++ Scalars.queries ++ StreamTwins.queries ++
      Udx.queries ++ Llm.queries ++ Extras.queries ++ Multimodal.queries ++
      MrCore.queries ++ Reshape.queries ++ Pipeline.queries ++
      Analytics.queries ++ Insights.queries ++ Workloads.queries ++
      Curation.queries ++ Learn.queries ++ Frontier.queries ++
      Signals.queries ++ Corpus.queries ++ Refine.queries ++
      Marts.queries ++ Basis.queries ++ Diag.queries ++ Assay.queries ++
      Behavior.queries ++ Audit.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Joins.oracle ++ Aggs.oracle ++ Windows.oracle ++
      SetOps.oracle ++ Scalars.oracle ++ StreamTwins.oracle ++
      Udx.oracle ++ Llm.oracle ++ Extras.oracle ++ Multimodal.oracle ++
      MrCore.oracle ++ Reshape.oracle ++ Pipeline.oracle ++
      Analytics.oracle ++ Insights.oracle ++ Workloads.oracle ++
      Curation.oracle ++ Learn.oracle ++ Frontier.oracle ++
      Signals.oracle ++ Corpus.oracle ++ Refine.oracle ++
      Marts.oracle ++ Basis.oracle ++ Diag.oracle ++ Assay.oracle ++
      Behavior.oracle ++ Audit.oracle
}
