package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT per-group discrete quantile by distributed rank selection —
  * the scale path for what `percentile()` does with an in-memory
  * sort buffer per group. Spark's exact percentile aggregate collects
  * every group value into one executor buffer: at 100 TB a dominant
  * group overflows it long before the data is "big". Histogram-refine
  * instead (the [[graft.llm.Pipelines.materializeMixture]] selection
  * trick, on value ranges):
  *
  *   1. one pass: per-group (n, min, max); target rank r = ⌈p·n⌉;
  *   2. one pass: counts per (group, value-bucket) — bucketing is any
  *      MONOTONE map of the value (here linear in (v−min)/(max−min),
  *      floored and clamped; IEEE subtraction/division/floor are all
  *      monotone, so bucket order respects value order exactly);
  *   3. a running sum over the tiny (groups × buckets) histogram
  *      finds each group's BOUNDARY bucket — the one holding rank r;
  *   4. only boundary-bucket rows (~1/buckets of the group) are
  *      ranked, partitioned by (group, bucket), and the row at local
  *      rank r − cum_before supplies the answer.
  *
  * No partition ever holds more than one bucket of one group; ties at
  * the selected rank all carry the selected VALUE, so the result is
  * deterministic regardless of tie order. Nulls are ignored (SQL
  * quantile semantics). Exactness does not depend on FP bucket
  * boundaries — only on monotonicity — which is why the result can be
  * hash-compared against a plain rank-window oracle (q137).
  */
object ExactQuantile {

  /** (group, n, q): q = the ⌈p·n⌉-th smallest value of the group.
    * p in (0, 1]; p=0.5 is the lower median, p=1 the max. */
  def quantileDisc(df: DataFrame, group: Column, value: Column,
                   p: Double, buckets: Int = 256): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"p must be in (0,1], got $p")
    require(buckets >= 2, "need at least 2 buckets")
    val v = df.select(group.as("grp"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val stats = v.groupBy(col("grp")).agg(count(lit(1)).as("n"),
        min(col("v")).as("__mn"), max(col("v")).as("__mx"))
      .withColumn("__r", ceil(lit(p) * col("n")).cast("long"))
    val bucketed = v.join(broadcast(stats), Seq("grp"))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(
            floor((col("v") - col("__mn")) / (col("__mx") - col("__mn"))
              * buckets).cast("int"), lit(buckets - 1))))
    val hw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val boundary = bucketed.groupBy(col("grp"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", coalesce(sum(col("__cnt")).over(hw), lit(0L)))
      .join(broadcast(stats.select(col("grp"), col("__r"))), Seq("grp"))
      .filter(col("__before") < col("__r") &&
        col("__before") + col("__cnt") >= col("__r"))
      .select(col("grp"), col("__b"),
        (col("__r") - col("__before")).as("__local_r"))
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"), col("__b")).orderBy(col("v"))
    bucketed.join(broadcast(boundary), Seq("grp", "__b"))
      .withColumn("__rn", row_number().over(bw))
      .filter(col("__rn") === col("__local_r"))
      .select(col("grp"), col("n"), col("v").as("q"))
  }

  /** EXACT per-group WEIGHTED discrete quantiles, all-integer: for each
    * requested fraction num/den, the smallest value v whose cumulative
    * weight satisfies W(≤v)·den ≥ num·W_total. With integer weights the
    * comparison never touches floating point, so the result is
    * hash-exact across engines (the q229 KS-drift discipline applied to
    * selection instead of distance).
    *
    * Scale shape: the event grain collapses to the per-group DISTINCT
    * value grid first (map-side combinable sum of weights), and the
    * window cumsum runs over that grid only — per-partition state is
    * bounded by a group's value cardinality, not its row count. A
    * measure with unbounded distinct values wants [[quantileDisc]]'s
    * histogram-refine instead; weighted measures in practice (prices in
    * cents, durations in ms buckets) have bounded grids.
    *
    * `qs` = (output column name, numerator, denominator); output is one
    * row per group: (grp, total_w, <one column per requested q>).
    */
  def weightedQuantileDisc(df: DataFrame, group: Column, value: Column,
                           weight: Column,
                           qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach { case (n, num, den) =>
      require(num > 0 && den >= num, s"fraction $n=$num/$den not in (0,1]")
    }
    val perVal = df
      .select(group.as("grp"), value.cast("long").as("v"),
        weight.cast("long").as("w"))
      // w > 0, not just non-null: a zero weight would let its value be
      // selected as a quantile (cw unchanged but the row exists), and a
      // negative weight makes the cumulative sum non-monotone, breaking
      // the "min v with cw·den ≥ num·tw" selection rule entirely
      .filter(col("v").isNotNull && col("w").isNotNull && col("w") > 0)
      .groupBy(col("grp"), col("v")).agg(sum(col("w")).as("w"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    val cum = perVal
      .withColumn("__cw", sum(col("w")).over(wc))
      .withColumn("__tw", sum(col("w")).over(wt))
    val picks = qs.map { case (name, num, den) =>
      min(when(col("__cw") * den >= col("__tw") * num, col("v")))
        .as(name)
    }
    cum.groupBy(col("grp"))
      .agg(max(col("__tw")).as("total_w"), picks: _*)
  }
}
