package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-aggregate maintenance — the MV-refresh shape: a
  * persisted ADDITIVE aggregate table absorbs a delta batch with one
  * union + one key-grouped re-sum, so history is merged (|agg table| +
  * |delta| rows through one exchange), never recomputed from the raw
  * log. Works exactly for algebraic measures (count and sum here; avg
  * is maintained as sum+count and divided at read time; min/max merge
  * the same way) — the standard incremental-view contract. The same
  * merge is associative and commutative, so shard-parallel and
  * out-of-order refreshes converge to the batch answer — q200 proves
  * it with a differential oracle (three overlapping-key deltas merged
  * incrementally vs one full recompute).
  *
  * The non-additive cousins route elsewhere: distinct counts through
  * mergeable sketches ([[Kmv]], q190), quantiles through
  * [[ExactQuantile]] re-selection, full SCD state through
  * [[Scd.mergeType2]].
  */
object IncrementalAgg {

  /** Merge a delta into an existing aggregate table: both frames must
    * carry `keys` + `sums` columns (the delta pre-aggregated by the
    * same keys — cheap map-side work); every sum column re-sums per
    * key. */
  def merge(existing: DataFrame, delta: DataFrame, keys: Seq[String],
            sums: Seq[String]): DataFrame = {
    require(sums.nonEmpty, "need at least one additive measure")
    val aggs = sums.map(c => sum(col(c)).as(c))
    existing.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
