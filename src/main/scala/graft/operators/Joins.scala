package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2c). JX itself has no join clause — the
  * reference joins imperatively during ETL (public repo
  * `vendor/mo_collections/unique_index.py` probe-per-doc, and the
  * "join" etl type in `activedata_etl/transforms/__init__.py`). Here they
  * are first-class, Spark-planned:
  *
  *  - J1 enrichment = broadcast hash join (dim side broadcast — the
  *    UniqueIndex probe becomes a map-side hash lookup, no shuffle of the
  *    fact table);
  *  - semi/anti joins for EXISTS/NOT EXISTS oracle breadth;
  *  - J4 nested reassembly (un-explode) = groupBy + sorted collect_list of
  *    structs, the inverse of Catalog's nested-path explode.
  */
object Joins {

  /** J1: lookup/enrichment join against a (small) dimension table.
    * Broadcast by default — at 100 TB the fact side never moves. */
  def enrich(fact: DataFrame, dim: DataFrame, cond: Column,
             how: String = "left", broadcastDim: Boolean = true): DataFrame =
    fact.join(if (broadcastDim) broadcast(dim) else dim, cond, how)

  /** J2: block co-group proper — both sides shuffle ONCE on the key
    * and the user function sees each key's two row groups together
    * (the reference merges two block sources per key this way; public
    * repo `activedata_etl` co-group transforms). Prefer a join +
    * aggregation when the merge is expressible relationally — Catalyst
    * optimizes that form; this is for genuinely per-key imperative
    * merges (interleaving, custom reconciliation, typed ADT output). */
  def coGroup[K: Encoder, L, R, O: Encoder](
      left: Dataset[L], right: Dataset[R])(
      lk: L => K, rk: R => K)(
      f: (K, Iterator[L], Iterator[R]) => IterableOnce[O]): Dataset[O] =
    left.groupByKey(lk).cogroup(right.groupByKey(rk))(f)

  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** As-of join: for each left row, attach the latest right row whose
    * timestamp is <= the left timestamp, per key (point-in-time join —
    * enrichment against slowly-changing state). Built per the preference
    * order by COMPOSING built-ins: tag + unionByName + one window pass
    * (`last` ignoring nulls over rows-up-to-current). ONE shuffle on the
    * key, sort within partitions, no custom physical operator needed —
    * the sort-merge the custom SparkPlan would do, expressed logically.
    *
    * @param rightCols right-side columns to carry (prefixed `asof_`)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: Column, rightTs: Column,
           rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__ts", leftTs).withColumn("__side", lit(1))
    val r = right.withColumn("__ts", rightTs).withColumn("__side", lit(0))
      .select((Seq(col(key), col("__ts"), col("__side")) ++
        rightCols.map(c => col(c).as(s"asof_$c"))).toIndexedSeq: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts, so "<=" holds
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Range join: left points against right [lo, hi) intervals — again by
    * composition: both sides bucketize to a `bucketWidth` grid (intervals
    * explode to every bucket they touch), equi-join on the bucket, exact
    * filter after. Turns the O(n*m) inequality join into a hash join
    * whose fan-out is interval_width / bucketWidth — pick bucketWidth
    * near the typical interval width. */
  def rangeJoin(left: DataFrame, point: Column,
                right: DataFrame, lo: Column, hi: Column,
                bucketWidth: Double, how: String = "inner"): DataFrame = {
    val lB = left.withColumn("__rb", floor(point / bucketWidth))
    val rB = right.withColumn("__rb",
      explode(sequence(floor(lo / bucketWidth), floor(hi / bucketWidth))))
    lB.join(rB, Seq("__rb"), how)
      .filter(point >= lo && point < hi)
      .drop("__rb")
  }

  /** J4: reassemble child rows into a sorted array column on the parent —
    * parent doc + child array (SURVEY.md §2c J4). `childCols` become a
    * struct; array sorted by the struct's natural order for deterministic
    * output under parallel execution. */
  def reassemble(parent: DataFrame, child: DataFrame, key: String,
                 childArrayName: String, childCols: Seq[Column]): DataFrame = {
    val nested = child
      .groupBy(col(key))
      .agg(array_sort(collect_list(struct(childCols.toIndexedSeq: _*)))
        .as(childArrayName))
    parent.join(nested, Seq(key), "left")
  }
}
