package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + BASELINE.md.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2,
  * expressed through the JX engine (graft.jx) where the capability is part
  * of the JX language, or through the graft library operators (dedup,
  * similarity, text analysis) for the LLM-pipeline extensions. Every entry
  * has a DuckDB `oracleSql` twin on the same parquet tables unless the op
  * is not SQL-expressible (then the driver records a rows-only check).
  *
  * Floating-point policy: double-valued aggregates are rounded (4-6
  * digits) IN BOTH the Spark query and the oracle SQL, so hash-compare is
  * insensitive to summation order (Spark's partial aggregates and DuckDB
  * sum in different orders; the true FP error is ~1e-9 relative, far below
  * the rounding grain).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 skeleton through the full JX pipeline (SURVEY.md §7 M1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_aggs")(spark, "/root/testdata/sf0.001")


  /** One entry per implemented operator from SURVEY.md §2.
    *
    * OUTPUT CONTRACT: no raw array/struct columns in a query's final
    * output — the driver's comparator sorts rows by every column and
    * cannot sort array cells. Explode (doc_id, j, value) or
    * array_to_string instead (q118 learned this the hard way). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesEtl.queries ++
    QueriesGraph.queries ++
    QueriesJx.queries ++
    QueriesLlmA.queries ++
    QueriesLlmB.queries ++
    QueriesLlmC.queries ++
    QueriesLlmD.queries ++
    QueriesStreaming.queries ++
    QueriesWarehouseA.queries ++
    QueriesWarehouseB.queries ++
    QueriesWarehouseC.queries

  /** DuckDB-equivalent ANSI SQL per query (same column names &
    * rounding). */
  def oracleSql: Map[String, String] =
    QueriesEtl.oracleSql ++
    QueriesGraph.oracleSql ++
    QueriesJx.oracleSql ++
    QueriesLlmA.oracleSql ++
    QueriesLlmB.oracleSql ++
    QueriesLlmC.oracleSql ++
    QueriesLlmD.oracleSql ++
    QueriesStreaming.oracleSql ++
    QueriesWarehouseA.oracleSql ++
    QueriesWarehouseB.oracleSql ++
    QueriesWarehouseC.oracleSql
}
