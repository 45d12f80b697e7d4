package graft.jx

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** JX aggregate name -> Spark aggregate Column (SURVEY.md §2d; public repo
  * `vendor/jx_python/windows.py` — the same classes serve grouped and
  * windowed aggregation there, and the same mapping serves both here).
  *
  * All are builtin declarative aggregates: Catalyst plans them as
  * partial/final hash aggregates (map-side combine), which is the
  * scale-out story at 100 TB — no driver-side state.
  *
  * Collection-valued aggregates (`union`, `list`) sort their result so
  * output is deterministic under parallel (shuffle-order-free) execution.
  */
object Aggs {
  /** exact=true: oracle-parity functions (exact percentile/countDistinct);
    * exact=false: scale-path approximations (approx_count_distinct,
    * percentile_approx) — same API, flip per deployment. */
  def aggColumn(aggregate: String, value: Option[Column],
                percentile: Option[Double], exact: Boolean = true): Column = {
    def v = value.getOrElse(lit(1))
    aggregate match {
      case "count" => value.map(count).getOrElse(count(lit(1)))
      case "sum" | "add" => sum(v)
      case "min" | "minimum" => min(v)
      case "max" | "maximum" => max(v)
      case "avg" | "average" | "mean" => avg(v)
      case "median" =>
        if (exact) call_function("percentile", v, lit(0.5))
        else percentile_approx(v, lit(0.5), lit(10000))
      case "percentile" =>
        val p = lit(percentile.getOrElse(0.5))
        if (exact) call_function("percentile", v, p)
        else percentile_approx(v, p, lit(10000))
      case "cardinality" =>
        if (exact) countDistinct(v) else approx_count_distinct(v)
      case "union" => array_sort(collect_set(v))
      case "list"  => array_sort(collect_list(v))
      case "one"   => first(v, ignoreNulls = true)
      case "first" => first(v, ignoreNulls = true)
      case "last"  => last(v, ignoreNulls = true)
      case "std" | "stddev" => stddev_samp(v)
      case "var" | "variance" => var_samp(v)
      case "stats" => struct(
        count(v).as("count"), sum(v).as("sum"), min(v).as("min"),
        max(v).as("max"), avg(v).as("avg"), stddev_samp(v).as("std"),
        var_samp(v).as("var"))
      case "exists" => max(v.isNotNull)
      case a => throw new IllegalArgumentException(s"unknown aggregate: $a")
    }
  }

  /** Aggregates whose value over an empty (densified) partition is 0, not
    * null — used when the dense domain left-join finds no rows. */
  def zeroWhenEmpty(aggregate: String): Boolean =
    aggregate == "count" || aggregate == "cardinality"

  /** Numeric-input aggregates get a double cast so JX "number" semantics
    * (int/float unified, SURVEY.md §2 data model) hold regardless of the
    * stored parquet type. */
  def castForAgg(aggregate: String, c: Column): Column = aggregate match {
    case "sum" | "add" | "avg" | "average" | "mean" | "median" |
        "percentile" | "std" | "stddev" | "var" | "variance" =>
      c.cast(DoubleType)
    case _ => c
  }
}
