package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval analytics: max concurrency over (start, end)
  * intervals — "how many sessions/jobs/streams were open at once",
  * the resource-sizing census behind connection pools, rate limits
  * and autoscaling.
  *
  * Shape: each interval emits its two endpoints (+1 at start, −1 at
  * end) from ONE row-local explode (no second scan, no self-join);
  * a per-group running sum over the time-ordered endpoint stream is
  * the live count, and its per-group max is read with a second
  * partition-bounded window in the same shuffle — one exchange on
  * the group key total, state bounded by a group's endpoint count.
  *
  * Tie rule (pinned for cross-engine determinism): at equal time the
  * −1 sorts before the +1 (d ascending), so a back-to-back
  * end/start at the same microsecond never double-counts. Equal
  * (t, d) rows permute freely under the ROWS frame, but all carry
  * the same delta, so the running-sum VALUE SET — and hence the max
  * and its earliest time — is permutation-invariant.
  */
object Sweep {

  /** Per-group (max_concurrent, at_us = earliest time the max is
    * live). `startUs`/`endUs` are epoch-microsecond longs. */
  def maxConcurrent(df: DataFrame, group: Column,
                    startUs: Column, endUs: Column): DataFrame = {
    val pts = df.select(group.as("grp"),
        explode(array(
          struct(startUs.cast("long").as("t"), lit(1).as("d")),
          struct(endUs.cast("long").as("t"), lit(-1).as("d"))))
          .as("p"))
      .select(col("grp"), col("p.t").as("t"), col("p.d").as("d"))
    val run = Window.partitionBy(col("grp")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("grp"))
    pts
      .withColumn("run", sum(col("d")).over(run).cast("long"))
      .withColumn("__mx", max(col("run")).over(all))
      .filter(col("run") === col("__mx"))
      .groupBy(col("grp"))
      .agg(max(col("run")).as("max_concurrent"),
        min(col("t")).as("at_us"))
  }
}
