package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchy rollup over MATERIALIZED-PATH keys — the BOM-explosion /
  * org-chart / category-tree aggregate ("subtree totals for every
  * node") without recursion: when a node's ancestors are computable
  * from its key alone (path-encoded ids — here arithmetic div-chains;
  * in general any prefix-decomposable key), ancestor enumeration is a
  * ROW-LOCAL explode of ≤ depth values, and the whole rollup is one
  * ancestor-keyed aggregation. A recursive-CTE engine walks the tree
  * edge by edge (depth joins); the path encoding turns the same
  * answer into scan → explode(depth) → agg — the shape that survives
  * a 100 TB fact table, because depth is a small constant while the
  * edge-walk would shuffle the whole table per level.
  *
  * Nodes whose computed ancestor does not exist in the relation
  * (gaps in the key space) still roll into it arithmetically;
  * `existingOnly` (default) semi-joins ancestors against the real
  * node set, so totals land only on actual nodes. */
object Hierarchy {

  /** (node, anc) pairs for the div-chain path encoding: ancestors of
    * k are k, k div base, k div base², … (> 0), self included. */
  def divChainAncestors(node: Column, base: Int, depth: Int): Column = {
    require(base >= 2 && depth >= 1, "base >= 2, depth >= 1")
    val divisors = (0 to depth).map(j =>
      math.pow(base, j).toLong).mkString("array(", "L,", "L)")
    expr(s"filter(transform($divisors, d -> ${node.toString} div d)," +
      " a -> a >= 1)")
  }

  /** Subtree rollup: for every node, the count and sum of `x` over
    * its subtree (self included). One explode + one aggregation (+ a
    * semi-join when `existingOnly`). */
  def subtreeRollup(rel: DataFrame, node: Column, x: Column, base: Int,
                    depth: Int, existingOnly: Boolean = true)
      : DataFrame = {
    val pr = rel.select(node.as("node"), x.as("x"))
    val anc = pr.withColumn("anc",
        explode(divChainAncestors(col("node"), base, depth)))
      .select(col("anc"), col("x"))
    val rolled =
      if (existingOnly)
        anc.join(pr.select(col("node").as("anc")).distinct(), Seq("anc"),
          "left_semi")
      else anc
    rolled.groupBy(col("anc"))
      .agg(count(lit(1)).as("n_subtree"), sum(col("x")).as("sum_subtree"))
      .withColumnRenamed("anc", "node")
  }
}
