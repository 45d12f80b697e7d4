package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size JOIN-CARDINALITY statistics — the ANALYZE-stats
  * planner input, built as data: a `buckets`-row histogram per join
  * key (rows + distinct keys per hash bucket) estimates any
  * equi-join's output size with the textbook containment/uniformity
  * rule Σ_b rows_A(b)·rows_B(b)/max(ndv_A(b), ndv_B(b)) — BEFORE
  * running the join. At 100 TB: histograms are built once per table
  * in one scan (or maintained additively per ingest batch — rows and
  * per-bucket NDV via [[Kmv]] both merge), live in the catalog, and
  * every join-order / broadcast-threshold decision reads 64 rows
  * instead of sampling the data. Everything here is exact integer
  * math over the histogram (floor division at the end), so estimates
  * replay bit-for-bit in SQL — q297's oracle rebuilds histograms,
  * estimates, AND the true join sizes, making the estimation error
  * itself part of the hash-compared contract. */
object JoinStats {

  /** (bucket, n_rows, n_keys) histogram of `key`: `pmod(key, buckets)`
    * so the bucketing is engine-portable. */
  def bucketHistogram(df: DataFrame, key: Column,
                      buckets: Int): DataFrame = {
    require(buckets >= 1, "need buckets >= 1")
    df.select(key.cast("long").as("k"))
      .groupBy(pmod(col("k"), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("k")).as("n_keys"))
  }

  /** Estimated |A ⋈ B| from two [[bucketHistogram]]s on the same
    * bucket count: per bucket floor(rows_A·rows_B / max(ndv_A,
    * ndv_B)), summed. Single-row frame (est). */
  def estimateEquiJoin(histA: DataFrame, histB: DataFrame): DataFrame =
    histA.select(col("bucket"), col("n_rows").as("__ra"),
        col("n_keys").as("__ka"))
      .join(histB.select(col("bucket"), col("n_rows").as("__rb"),
        col("n_keys").as("__kb")), Seq("bucket"))
      .select(expr("CAST((__ra * __rb) div greatest(__ka, __kb) " +
        "AS BIGINT)").as("__e"))
      .agg(coalesce(sum(col("__e")), lit(0L)).as("est"))
}
