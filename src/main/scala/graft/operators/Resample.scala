package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Deterministic Poisson bootstrap — the resampling scheme that works
  * on distributed data (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", Google 2012): instead of drawing n rows
  * with replacement (which needs global coordination), every row
  * enters replicate r with an independent Poisson(1) weight, and the
  * replicate-to-replicate spread of the weighted metric estimates its
  * sampling variance. Here the Poisson draw is DERANDOMIZED: the
  * uniform is the first 8 hex chars of md5(seed:id:r) — a pure
  * function of (id, replicate), reshuffle/rerun-stable and
  * replayable by any engine with md5 — pushed through the Poisson(1)
  * inverse CDF as FIXED integer thresholds on the 2³² scale (floor of
  * the true CDF ×2³² — the comparison is exact integer vs integer,
  * so no engine can disagree by a ULP; P(weight > 6) ≈ 8·10⁻⁸ truncates
  * to 6).
  *
  * Scale shape: weights are row-local (one md5 per row×replicate);
  * the replicate explosion multiplies the scan by R BEFORE one
  * (group, replicate)-keyed aggregation — map-side partial agg
  * absorbs it, and nothing global happens until the R-row-per-group
  * summary frame. */
object Resample {

  /** Poisson(1) CDF, scaled by 2³² and floored: weight = #thresholds
    * strictly below the 32-bit uniform. */
  private val PoissonThresholds = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L)

  /** 32-bit uniform in [0, 2³²) from md5(seed:id:r). */
  def uniform32(id: Column, replicate: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"),
      lit(":"), replicate.cast("string")).cast(BinaryType)), 1, 8),
      16, 10).cast("long")

  /** Deterministic Poisson(1) bootstrap weight for (id, replicate). */
  def poissonWeight(id: Column, replicate: Column, seed: String)
      : Column = {
    val u = uniform32(id, replicate, seed)
    PoissonThresholds.foldLeft(lit(0)) { (acc, t) =>
      acc + when(u >= t, 1).otherwise(0)
    }
  }

  /** R bootstrap replicates of a weighted mean: one row per
    * (group, replicate) with the exact integer Σw / Σw·x and their
    * one-division IEEE mean — the spread across replicates IS the
    * uncertainty of the group's mean of `x` (an integer-valued
    * metric column, e.g. cents). */
  def bootstrapMeans(rel: DataFrame, group: Column, id: Column,
                     x: Column, replicates: Int, seed: String)
      : DataFrame = {
    require(replicates >= 1, "replicates must be >= 1")
    rel.select(group.as("g"), id.as("id"), x.as("x"))
      .withColumn("r", explode(expr(s"sequence(1, $replicates)")))
      .withColumn("w", poissonWeight(col("id"), col("r"), seed))
      .groupBy(col("g"), col("r"))
      .agg(sum(col("w").cast("long")).as("sum_w"),
        sum(col("w").cast("long") * col("x")).as("sum_wx"))
      .withColumn("mean",
        col("sum_wx").cast("double") / col("sum_w").cast("double"))
  }
}
