package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

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
