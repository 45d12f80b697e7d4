package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGEABLE quantile summaries — the distribution member of the
  * partition-manifest family ([[Fingerprint]] answers "are these rows
  * equal", [[Kmv]] "how many distinct", this one "how are values
  * distributed") : each shard keeps a RANK-SPACED weighted sample of
  * its sorted values (every k-th order statistic, with the stride
  * width as its weight), summaries union additively, and any
  * quantile is answered from the merged summary with rank error
  * < shards·(k−1) — so a 100 TB table gets per-partition
  * distribution manifests written once at ingest, and "p95 across
  * the whole table / any subset of partitions" costs a summary-only
  * aggregation with history never re-scanned.
  *
  * Everything is DETERMINISTIC data math (total order by
  * (value, tie); stride arithmetic on integer ranks) — no RNG, no
  * sketch-library internals — so summaries, merges, and query
  * answers replay bit-for-bit in any SQL engine: the q294 oracle
  * rebuilds the whole pipeline relationally.
  *
  * Scheme (a spaced ε-summary, the Greenwald–Khanna idea reduced to
  * its restartable batch form): per (group, shard) sort by
  * (value, tie); keep ranks 1, k+1, 2k+1, …; keeper at rank r
  * carries weight min(k, n−r+1) — the strides tile [1..n] exactly,
  * so Σweights = n and merged cumulative weights are EXACT counts of
  * "elements with value ≤ some element in this stride". A rank
  * query t answered from the merged summary returns a value whose
  * true rank is within Σ_shards (k−1) of t; k = 1 degenerates to
  * the exact multiset. */
object QuantileSummary {

  /** Per-(group, shard) weighted summary: (grp, value, w) rows.
    * `tie` must make (value, tie) a total order within a shard for
    * bit-replayability. `shards` controls parallelism of the sort
    * (each shard sorts independently — at scale, shard = the
    * physical partition the manifest is written with). */
  def shardSummary(df: DataFrame, group: Column, value: Column,
                   tie: Column, shards: Int, k: Int): DataFrame = {
    require(shards >= 1 && k >= 1, "need shards >= 1 and k >= 1")
    val base = df.select(group.as("grp"), value.cast("long").as("v"),
        tie.cast("long").as("t"))
      .withColumn("sh", pmod(col("t"), lit(shards.toLong)))
    val w = Window.partitionBy(col("grp"), col("sh"))
      .orderBy(col("v"), col("t"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp"), col("sh"))))
      .filter(pmod(col("rn") - 1, lit(k)) === 0)
      .select(col("grp"), col("v").as("value"),
        least(lit(k.toLong), col("n") - col("rn") + 1).as("w"))
  }

  /** Merge summaries: summaries are weighted row sets, so merge is
    * UNION — commutative, associative, shard-order-independent (the
    * same property that makes [[Fingerprint.merge]] additive). */
  def merge(summaries: Seq[DataFrame]): DataFrame =
    summaries.reduce(_ unionByName _)

  /** Answer quantiles from a merged summary: for each q in `qs`,
    * the smallest summary value whose cumulative weight reaches
    * ceil(q·N). Emits (grp, q, value, n) — exact integer threshold
    * selection (the q231 weighted-quantile discipline), no
    * interpolation, deterministic across engines. The summary is
    * tiny (Σ ceil(n_shard/k) rows per group), so the window sort
    * here is over manifest rows, never data rows. */
  def quantiles(summary: DataFrame, qs: Seq[Double]): DataFrame = {
    val agg = summary.groupBy(col("grp"), col("value"))
      .agg(sum(col("w")).as("w"))
    val w = Window.partitionBy(col("grp")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = agg
      .withColumn("cw", sum(col("w")).over(w))
      .withColumn("n", sum(col("w")).over(
        Window.partitionBy(col("grp"))))
    val qcols = qs.map(q => struct(lit(q).as("q"),
      ceil(lit(q) * col("n") - lit(1e-9)).cast("long").as("tgt")))
    cum.select(col("grp"), col("value"), col("cw"), col("n"),
        explode(array(qcols: _*)).as("qq"))
      .filter(col("cw") >= greatest(col("qq.tgt"), lit(1L)))
      .groupBy(col("grp"), col("qq.q").as("q"))
      .agg(min(col("value")).as("value"), max(col("n")).as("n"))
  }
}
