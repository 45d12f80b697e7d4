package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table reconciliation: the COLUMN-LEVEL complement to
  * `Pipelines.snapshotDiff` (which classifies whole rows by content
  * fingerprint). Given two snapshots of a keyed table, emit a melted
  * census: how many keys were added/removed/unchanged, and — per
  * compared column — how many matched keys CHANGED in that column.
  * The per-column breakdown is what turns "13k rows changed" into
  * "the migration rewrote `source` on exactly the rows it claimed".
  *
  * Shape: ONE full-outer equi-join on the key; every census is a
  * conditional aggregate over that join — the snapshots are scanned
  * once each regardless of how many columns are compared. With both
  * snapshots bucketed by the key (the natural layout for an
  * append-only snapshot store) the join is co-located. Null-safe:
  * value comparisons use IS DISTINCT FROM semantics, so null→value
  * and value→null count as changes while null→null does not.
  */
object Reconcile {

  /** (metric, n) rows: `added`, `removed`, `matched`,
    * `changed_any`, and one `changed:<col>` per compared column —
    * deterministic order by metric name.
    *
    * Precondition: `key` must be UNIQUE within each snapshot — a
    * duplicated key fans out the full-outer join and inflates
    * matched/changed counts multiplicatively. Deduplicate or
    * aggregate to the key grain first if the store allows dupes. */
  def columnDiffCensus(prev: DataFrame, cur: DataFrame,
                       key: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty,
      "columnDiffCensus needs at least one column to compare")
    val p = prev.select(col(key).as("__k") +:
      cols.map(c => col(c).as(s"__p_$c")): _*)
    val c = cur.select(col(key).as("__k") +:
      cols.map(c => col(c).as(s"__c_$c")): _*)
    val j = p.withColumn("__in_p", lit(1))
      .join(c.withColumn("__in_c", lit(1)), Seq("__k"), "full_outer")
    val matched = col("__in_p").isNotNull && col("__in_c").isNotNull
    def changed(name: String): Column =
      matched && !(col(s"__p_$name") <=> col(s"__c_$name"))
    val anyChanged = cols.map(changed).reduce(_ || _)
    def cnt(pred: Column): Column =
      sum(when(pred, 1L).otherwise(0L))
    val aggs =
      cnt(col("__in_p").isNull).as("added") +:
      cnt(col("__in_c").isNull).as("removed") +:
      cnt(matched).as("matched") +:
      cnt(anyChanged).as("changed_any") +:
      cols.map(n => cnt(changed(n)).as(s"changed:$n"))
    val wide = j.agg(aggs.head, aggs.tail: _*)
    // melt the single wide row to (metric, n) — tiny, driver-free
    val names = wide.columns
    wide.select(explode(array(names.map(n =>
        struct(lit(n).as("metric"), col(s"`$n`").as("n"))): _*))
        .as("m"))
      .select(col("m.metric").as("metric"), col("m.n").as("n"))
      .orderBy(col("metric"))
  }
}
