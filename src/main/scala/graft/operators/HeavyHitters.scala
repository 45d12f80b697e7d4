package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGEABLE heavy-hitter summaries (Misra–Gries from exact shard
  * censuses) — the FREQUENCY member of the partition-manifest family
  * ([[Fingerprint]] equality, [[Kmv]] distinct, [[QuantileSummary]]
  * distribution): each shard keeps its top-m values with the
  * (m+1)-th count subtracted (the classic MG threshold), summaries
  * merge by summed counts, and every estimate carries a PROVEN
  * bracket — est(v) ≤ true(v) ≤ est(v) + Σ_shards thr_shard. At
  * 100 TB: per-partition vocabulary/entity manifests of m rows each
  * are written once at ingest, and "top tokens across any partition
  * subset, with error bars" is a manifest-only aggregation; history
  * is never re-tokenized.
  *
  * Unlike a count-min sketch ([[CountMin]], q152) the summary is
  * deterministic data math — top-m by (count DESC, value ASC), one
  * integer subtraction — so manifests, merges, and bounds replay
  * bit-for-bit in SQL (q295's oracle rebuilds all of it).
  */
object HeavyHitters {

  /** Per-(group, shard) MG summary from one occurrence frame (one
    * row per occurrence). Returns (summary, slack):
    *  - summary: (grp, value, est) with est > 0 — value kept by its
    *    shard's top-m with the threshold already subtracted;
    *  - slack: (grp, slack) — Σ over this frame's shards of the
    *    (m+1)-th count, the additive error budget those summaries
    *    contribute to any merged estimate.
    * `shard` must be a deterministic column (e.g. pmod of a stable
    * id) so the manifest is rerun-stable. */
  def shardSummaries(df: DataFrame, group: Column, value: Column,
                     shard: Column, m: Int): (DataFrame, DataFrame) = {
    require(m >= 1, "need m >= 1")
    val census = df.select(group.as("grp"), value.as("v"),
        shard.as("sh"))
      .groupBy(col("grp"), col("sh"), col("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp"), col("sh"))
      .orderBy(col("c").desc, col("v").asc)
    val ranked = census.withColumn("rn", row_number().over(w))
      .withColumn("thr", coalesce(max(when(col("rn") === m + 1,
        col("c"))).over(Window.partitionBy(col("grp"), col("sh"))),
        lit(0L)))
    val summary = ranked
      .filter(col("rn") <= m && col("c") - col("thr") > 0)
      .groupBy(col("grp"), col("v").as("value"))
      .agg(sum(col("c") - col("thr")).as("est"))
    val slack = ranked
      .groupBy(col("grp"), col("sh")).agg(max(col("thr")).as("__t"))
      .groupBy(col("grp")).agg(sum(col("__t")).as("slack"))
    (summary, slack)
  }

  /** Merge summaries (summed estimates) and slacks (summed budgets)
    * from any number of batches — commutative and associative, the
    * manifest-family property. */
  def merge(summaries: Seq[DataFrame],
            slacks: Seq[DataFrame]): (DataFrame, DataFrame) = (
    summaries.reduce(_ unionByName _)
      .groupBy(col("grp"), col("value"))
      .agg(sum(col("est")).as("est")),
    slacks.reduce(_ unionByName _)
      .groupBy(col("grp")).agg(sum(col("slack")).as("slack")))
}
