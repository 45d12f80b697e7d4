package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group capped sampling as MERGEABLE STATE — the
  * "no single domain dominates" crawl guard (q388) published as an
  * operator, with the fold contract q389 proves against its oracle:
  *
  *   kminK(A ∪ B) = kminK( kminK(A) ∪ kminK(B) )
  *
  * The k smallest-hash rows per group are a SELECTION MONOID, so a
  * nightly ingest [[mine]]s each new batch (the only
  * data-proportional step) and [[merge]]s the resulting
  * k-row-per-group manifest into the standing one — history is never
  * re-ranked, and the fold sees ≤ 2k rows per group by construction.
  * Because the hash orders the sample, the kept set is reproducible
  * across runs, engines, batch arrival orders, and re-shardings.
  *
  * `order` is the full sort key and MUST start with the md5-hex hash
  * column (mine buckets by its first two chars — an order-range of
  * the sort axis, the [[BucketedRank]] requirement) and end with a
  * tiebreaker unique per row (the id), so ranks are total.
  */
object CapSample {

  /** Mine one batch: the k smallest-`order` rows per `group`. Input
    * is UNBOUNDED — ranking rides [[BucketedRank]] (per-(group,
    * hash-prefix) windows + triangular offsets), never a per-group
    * single-task window. Output keeps the input columns. */
  def mine(df: DataFrame, group: String, order: Seq[String],
           k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // The bucket is substring(order.head, 1, 2): only valid when the
    // head really is the documented md5-hex STRING — an implicit
    // numeric→string cast would make the prefix a lexicographic
    // bucket of a NUMERIC sort axis (no longer an order-range) and
    // silently corrupt ranks (r12 advice). Fail loudly instead.
    require(df.schema(order.head).dataType ==
      org.apache.spark.sql.types.StringType,
      s"CapSample.mine: order head '${order.head}' must be a string " +
        "(md5-hex) column — its 2-char prefix is the rank bucket and " +
        s"must be an order-range of the sort axis; got " +
        s"${df.schema(order.head).dataType.simpleString}")
    BucketedRank.rank(
        df.withColumn("__bk", substring(col(order.head), 1, 2)),
        Seq(group), "__bk", order, "__rk")
      .filter(col("__rk") <= k)
      .drop("__rk", "__bk")
  }

  /** Fold two manifests. Inputs must be [[mine]]/[[merge]] outputs
    * (≤ k rows per group BY CONSTRUCTION), so the per-group window
    * is safe: ≤ 2k rows per partition, never a corpus-sized one.
    * Dedup on (group, order) first: an at-least-once ingest that
    * REPLAYS a batch folds to a no-op (merge is idempotent), which
    * is exactly what a redelivered micro-batch needs. */
  def merge(a: DataFrame, b: DataFrame, group: String,
            order: Seq[String], k: Int): DataFrame =
    truncate(a.unionByName(b), group, order, k)

  /** Re-truncate a BOUNDED union of manifests (≤ k·m rows per group
    * for m appended batches) to the standing k — the n-way fold's
    * last step, used directly by the streaming manifest (one window
    * over the appended per-batch mines instead of m-1 pairwise
    * merges). Idempotence dedup for [[merge]] happens in two layers
    * (r12 advice — a bare key-dedup kept an ARBITRARY row when the
    * same (group, order) key arrived with a different payload, e.g.
    * a re-crawled doc whose n_tok changed between batches):
    * exact-duplicate rows (the at-least-once replay case) collapse
    * via distinct(), then any SURVIVING same-key rows — genuinely
    * divergent payloads — are picked DETERMINISTICALLY (least
    * NON-NULL row by the non-key columns in name order, nulls last:
    * Spark's default asc is nulls-FIRST, under which a degraded
    * redelivery carrying a null payload would silently displace the
    * real value and become the standing manifest row — r13 advice;
    * nulls-last also matches DuckDB's default ASC null order, so an
    * oracle replaying the pick never needs an explicit override), so
    * the standing manifest is a pure function of the set of rows
    * ever appended, whatever the batch arrival order. Non-key
    * columns must be orderable types (atomics/arrays — the manifest
    * shape). */
  def truncate(m: DataFrame, group: String, order: Seq[String],
               k: Int): DataFrame = {
    val keys = group +: order
    val payload = m.columns.filterNot(keys.contains).sorted
    val deduped =
      if (payload.isEmpty) m.dropDuplicates(keys)
      else {
        val kw = Window.partitionBy(keys.map(col): _*)
          .orderBy(payload.toIndexedSeq.map(c => col(c).asc_nulls_last): _*)
        m.distinct()
          .withColumn("__kd", row_number().over(kw))
          .filter(col("__kd") === 1).drop("__kd")
      }
    val w = Window.partitionBy(col(group))
      .orderBy(order.map(col): _*)
    deduped
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
