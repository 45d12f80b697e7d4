package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistics-driven JOIN STRATEGY selection — the piece Spark's own
  * file-size heuristic cannot do: decide to BROADCAST a *filtered*
  * slice of a big dimension before anything is shuffled.
  *
  * Spark picks broadcast-vs-shuffle from the relation's on-disk size
  * (`spark.sql.autoBroadcastJoinThreshold`), which knows nothing about
  * predicates: a 1 TB dimension filtered to 0.1% still plans as a
  * sort-merge join, and AQE can only convert it AFTER the map stage of
  * the shuffle has already run over the full fact side. At 100 TB the
  * first plan is the one that matters. This planner estimates the
  * post-filter cardinality from a bounded equi-width value histogram
  * (manifest data: `nBuckets` rows per column, built in one scan or
  * maintained additively per ingest batch — counts sum), converts it
  * to bytes with the catalog's row-width stat, and applies the
  * [[org.apache.spark.sql.functions.broadcast]] hint only when the
  * estimate clears the threshold.
  *
  * Everything is exact integer arithmetic over the histogram, so the
  * estimate — and therefore the DECISION — replays bit-for-bit in
  * plain SQL (q315's oracle re-derives both and the true filtered
  * counts, putting the estimation error itself under the hash gate).
  */
object JoinPlanner {

  /** Equi-width value histogram of `floor(v)`: `nBuckets` rows of
    * (bucket, n_rows) with bucket = clamp((v − lo) div width). The
    * clamp folds out-of-range values into the edge buckets so totals
    * are preserved (Σ n_rows = table rows with v non-null). floor()
    * BEFORE the long cast: Spark's cast truncates toward zero while
    * other engines round, so the floor is the portable contract. */
  def valueHistogram(df: DataFrame, v: Column, lo: Long, width: Long,
                     nBuckets: Int): DataFrame = {
    require(width >= 1 && nBuckets >= 1, "need width, nBuckets >= 1")
    val d = floor(v).cast("long") - lit(lo)
    // floorDiv(d, width) without FP: (d − pmod(d, w)) is a multiple of
    // w, so the division is exact; matches DuckDB's `//` on negatives
    val fd = ((d - pmod(d, lit(width))) / lit(width)).cast("long")
    df.filter(v.isNotNull)
      .select(greatest(lit(0L), least(lit(nBuckets - 1L), fd))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
  }

  /** Estimated rows with floor(v) < cut from a [[valueHistogram]],
    * uniformity-within-bucket, EXACT INTEGER math: full buckets below
    * the cut bucket count whole; the boundary bucket contributes
    * floor(n_rows · (cut − bucket_lo) / width). Single-row (est). */
  def estimateBelow(hist: DataFrame, lo: Long, width: Long,
                    nBuckets: Int, cut: Long): DataFrame = {
    val cutBucket = math.max(0L,
      math.min(nBuckets - 1L, Math.floorDiv(cut - lo, width)))
    val bucketLo = lo + cutBucket * width
    // within-bucket fraction, clamped to [0, width] so a cut past the
    // clamp range still counts the edge bucket fully
    val frac = math.max(0L, math.min(width, cut - bucketLo))
    hist.select(
      when(col("bucket") < cutBucket, col("n_rows"))
        .when(col("bucket") === cutBucket,
          expr(s"(n_rows * ${frac}L) div ${width}L"))
        .otherwise(lit(0L)).cast("long").as("__e"))
      .agg(coalesce(sum(col("__e")), lit(0L)).as("est"))
  }

  /** The broadcast decision: est_rows · bytesPerRow ≤ thresholdBytes.
    * One bounded single-row pull — a planner reads manifest rows,
    * never data. */
  def decideBroadcast(estRows: DataFrame, bytesPerRow: Long,
                      thresholdBytes: Long): Boolean = {
    val est = estRows.select(col("est").cast("long")).head().getLong(0)
    est * bytesPerRow <= thresholdBytes
  }

  /** The planned join: `fact ⋈ filtered-dim` with the broadcast hint
    * applied iff the histogram estimate clears the threshold. The
    * decision uses only manifest stats — Spark's own heuristic is
    * bypassed (callers typically run with autoBroadcastJoinThreshold
    * low or −1; the hint forces the right plan either way, and when
    * broadcast is NOT chosen the absence of a hint leaves Catalyst
    * free to shuffle both sides on the key). */
  def planFilteredDimJoin(fact: DataFrame, dim: DataFrame,
                          dimFilter: Column, keys: Seq[String],
                          hist: DataFrame, lo: Long, width: Long,
                          nBuckets: Int, cut: Long, bytesPerRow: Long,
                          thresholdBytes: Long): DataFrame = {
    val slice = dim.filter(dimFilter)
    val doBroadcast = decideBroadcast(
      estimateBelow(hist, lo, width, nBuckets, cut),
      bytesPerRow, thresholdBytes)
    fact.join(if (doBroadcast) broadcast(slice) else slice, keys)
  }
}
