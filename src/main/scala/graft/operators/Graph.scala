package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures as plain DataFrame joins — PageRank over
  * an edge list, plus the co-occurrence edge builder that turns a
  * (group, item) relation into the item-similarity graph ("parts
  * ordered together", "docs sharing a near-dup band"). The dedup side
  * of the engine already runs one fixed-point graph algorithm
  * (connected components, Dedup.scala); PageRank is the other one a
  * curation pipeline wants — rank items/domains by centrality before
  * sampling.
  *
  * Scale shape: each iteration is ONE edge-by-src equi-join against
  * the k-row rank frame plus one dst-keyed aggregation — both shuffle
  * by node id, and with the edge list bucketed by src the join side
  * of every iteration is exchange-free. Rank frames are persisted per
  * round and the previous round is freed, so lineage stays flat (the
  * [[graft.llm.KMeans.fit]] loop discipline).
  *
  * Determinism contract (what a SQL oracle can replay): with
  * `deterministic = true` the per-node contribution sum is a left
  * fold over the VALUE-SORTED contribution list — the q103
  * deterministicAvg trick — making every iteration bit-exact across
  * engines (plain `sum()` re-adds in partition order, off by ULPs).
  * The scale path keeps the plain sum: collect-per-node lists are
  * bounded by in-degree, so the fold mode is for verification and
  * moderate-degree graphs.
  *
  * Simplified (no dangling-mass redistribution): nodes without
  * out-edges leak their mass, the standard simplification. Symmetric
  * edge sets ([[coOccurrenceEdges]] output) have no such nodes.
  */
object Graph {

  /** Distinct directed co-occurrence edges from a (group, item)
    * relation: src and dst co-occur in some group, both directions,
    * never self. Distinct-before-join bounds the pair explosion to
    * Σ|group|² over DISTINCT members, and the output dedups again. */
  def coOccurrenceEdges(rel: DataFrame, group: org.apache.spark.sql.Column,
                        item: org.apache.spark.sql.Column): DataFrame = {
    val m = rel.select(group.as("g"), item.as("i")).distinct()
    m.join(m.withColumnRenamed("i", "j"), Seq("g"))
      .filter(col("i") =!= col("j"))
      .select(col("i").as("src"), col("j").as("dst"))
      .distinct()
  }

  /** Fixed-iteration PageRank over a (src, dst) edge list: returns
    * (node, pr) for every node appearing as a source. Uniform init
    * 1/N, per-iteration pr' = (1-d)/N + d·Σ_in pr(u)/outdeg(u). */
  def pageRank(edges: DataFrame, iterations: Int,
               damping: Double = 0.85,
               deterministic: Boolean = false): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node")).distinct()
    // N as a broadcast single-row frame: the loop stays declarative,
    // nothing lands on the driver
    val nN = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var pr = nodes.crossJoin(broadcast(nN))
      .select(col("node"), (lit(1.0) / col("__n")).as("pr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          (col("pr") / col("outdeg").cast("double")).as("c"))
      val sums =
        if (deterministic)
          contribs.groupBy(col("node")).agg(
            aggregate(array_sort(collect_list(col("c"))), lit(0.0),
              (acc, x) => acc + x).as("s"))
        else
          contribs.groupBy(col("node")).agg(sum(col("c")).as("s"))
      val next = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(nN))
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before freeing the previous round
      pr.unpersist(blocking = false)
      pr = next
    }
    e.unpersist(blocking = false)
    pr
  }
}
