package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.jx.Runner
import graft.tables.Catalog

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

  /** JX-engine query helper: JSON in, DataFrame out. */
  private def jx(json: String): (SparkSession, String) => DataFrame =
    (spark, dir) => new Runner(spark, new Catalog(spark, dir)).run(json)

  /** Round the named double columns for FP-stable oracle comparison. */
  private def rounded(cols: (String, Int)*)(
      fn: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = { (spark, dir) =>
    val df = fn(spark, dir)
    val m = cols.toMap
    df.select(df.columns.map { c =>
      m.get(c) match {
        case Some(d) => round(col(c), d).as(c)
        case None    => col(c)
      }
    }.toIndexedSeq: _*)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 skeleton through the full JX pipeline (SURVEY.md §7 M1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_aggs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- M1/M2: filter + groupby + aggregates (SURVEY.md §2b, §2d) ---
    "q01_groupby_aggs" -> rounded(
      "sum_qty" -> 4, "sum_base_price" -> 2, "sum_disc_price" -> 2,
      "avg_qty" -> 6, "avg_price" -> 6, "avg_disc" -> 6)(jx("""
      {"from": "lineitem",
       "where": {"lte": ["l_shipdate", {"date": "1998-09-02"}]},
       "groupby": ["l_returnflag", "l_linestatus"],
       "select": [
         {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
         {"name": "sum_base_price", "value": "l_extendedprice", "aggregate": "sum"},
         {"name": "sum_disc_price",
          "value": {"mult": ["l_extendedprice", {"sub": [1, "l_discount"]}]},
          "aggregate": "sum"},
         {"name": "avg_qty", "value": "l_quantity", "aggregate": "average"},
         {"name": "avg_price", "value": "l_extendedprice", "aggregate": "average"},
         {"name": "avg_disc", "value": "l_discount", "aggregate": "average"},
         {"name": "count_order", "aggregate": "count"}],
       "sort": ["l_returnflag", "l_linestatus"]}"""))
  )

  /** DuckDB-equivalent ANSI SQL per query (same column names & rounding). */
  def oracleSql: Map[String, String] = Map(
    "q01_groupby_aggs" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""
  )
}
