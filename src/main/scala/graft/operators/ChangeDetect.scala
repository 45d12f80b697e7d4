package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM change detection over per-key ordered series —
  * the classic "has this metric drifted above its baseline?" monitor
  * (Page 1954; the standard shape in SRE/quality dashboards). For a
  * series x_1..x_n with per-key deviations d_t, the statistic is the
  * recursion s_t = max(0, s_{t-1} + d_t): it accumulates sustained
  * positive drift and resets on evidence of being at/below baseline.
  *
  * The recursion LOOKS sequential, but unrolls to the closed form
  * s_t = p_t − min(0, min_{j≤t} p_j) over prefix sums p_t = Σ_{i≤t}
  * d_i — a running sum and a running min, both plain frame-bounded
  * window functions. That identity is what makes the operator
  * Spark-shaped: two entity-partitioned windows instead of a
  * driver-side fold, deterministic exact-integer output an SQL
  * oracle replays verbatim.
  *
  * Deviations are kept integer without ever computing a mean:
  * d_t = n·x_t − total (the per-key count/sum staged in ONE
  * aggregation and joined back) is n× the mean-centered deviation,
  * so `cusum` here is n× the textbook statistic — a positive scale
  * factor that preserves every crossing/reset and keeps the whole
  * pipeline overflow-safe exact arithmetic (|p_t| ≤ n²·max|x|).
  *
  * Scale shape: one key-grain aggregation + one key equi-join (AQE
  * broadcasts the k-row stats side) + two windows partitioned by the
  * SAME key — a single sort-shuffle services both windows. Requires
  * a unique `ord` per key (aggregate to the series grain first). */
object ChangeDetect {

  /** (k, o, cusum): n×-scaled one-sided CUSUM of `x` around the
    * key's own mean, ordered by `ord` within each `key`. */
  def cusum(rel: DataFrame, key: Column, ord: Column, x: Column)
      : DataFrame = {
    val base = rel.select(key.as("k"), ord.as("o"), x.as("x"))
    val stats = base.groupBy(col("k"))
      .agg(count(lit(1)).as("__n"), sum(col("x")).as("__tot"))
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(stats, Seq("k"))
      .withColumn("__p",
        sum(col("__n") * col("x") - col("__tot")).over(w))
      .select(col("k"), col("o"),
        (col("__p") - least(min(col("__p")).over(w), lit(0L)))
          .as("cusum"))
  }
}
