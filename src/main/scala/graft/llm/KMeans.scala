package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * step the SemDeDup recipe and a learned IVF quantizer actually train
  * with (the deterministic lowest-id quantizer in [[Similarity]] is
  * the INIT; this refines it).
  *
  * Shape per iteration, chosen for 100 TB:
  *  - ASSIGN is row-local: score every vector against the broadcast
  *    centroid array ([[Similarity.assignCells]]) — no shuffle;
  *  - UPDATE is a (cell, dim) grouped mean: posexplode to N·d narrow
  *    rows, but the groupBy key cardinality is only k·d, so map-side
  *    partial aggregation reduces each task's contribution to k·d
  *    rows BEFORE the shuffle — the exchange moves k·d·tasks rows,
  *    not N·d. The corpus is never collected and never re-shuffled.
  *  - the driver holds only the k×d centroid table between rounds
  *    (broadcast back as a literal single-row frame, same explicit
  *    (cent_id asc) ordering discipline as the PQ codebook).
  *
  * Empty cells keep their previous centroid (the standard Lloyd
  * convention that avoids k shrinking mid-run). */
object KMeans {

  /** Deterministic init: the k lowest-id vectors as the broadcastable
    * single-row centroid frame (the same coarse quantizer SemDedup and
    * the IVF paths start from). */
  def init(emb: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    val c = emb.select(id.as("vec_id"), vec.cast("array<double>").as("cv"))
    Similarity.centroids(c, k)
  }

  /** (cell, dim, c) per-cell per-dimension means of `vec` under the
    * given single-row centroid frame — ONE Lloyd update step, exposed
    * for differential testing (q101). `dim` is 1-based. */
  def updateStep(emb: DataFrame, id: Column, vec: Column,
                 cents: DataFrame): DataFrame = {
    val c = emb.select(id.as("vec_id"), vec.cast("array<double>").as("cv"))
    Similarity.assignCells(c, cents, "cv", "cell", 1)
      .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
      .groupBy(col("cell"), (col("pos") + 1).as("dim"))
      .agg(avg(col("x")).as("c"))
  }

  /** Rebuild the broadcastable single-row centroid frame from (cell,
    * dim, c) rows — explicit (cent_id asc, dim asc) ordering via
    * array_sort, never collect_list arrival order. Package-visible so
    * [[SemDedup]] and [[Similarity]] can consume a fitted table
    * through the same assignment path as the lowest-id quantizer. */
  private[llm] def centroidRow(means: DataFrame): DataFrame =
    means.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("c")))), s => s.getField("c")).as("centroid"))
      .agg(array_sort(collect_list(struct(
        col("cell").cast("long").as("cent_id"),
        col("centroid")))).as("__cents"))

  /** `iters` Lloyd rounds from the deterministic lowest-id init;
    * returns the final (cell, dim, c) centroid table. Each round is
    * one row-local assign + one k·d-keyed aggregation; empty cells
    * inherit the previous round's centroid.
    *
    * The returned frame is localCheckpoint-backed (the checkpoint cuts
    * the iterative lineage); when a long-running session is done with
    * it, free the executor blocks with [[Lifecycle.release]]. */
  def fit(emb: DataFrame, id: Column, vec: Column,
          k: Int, iters: Int): DataFrame = {
    require(iters > 0, "k-means needs at least one Lloyd round")
    val c = emb.select(id.as("vec_id"), vec.cast("array<double>").as("cv"))
    var cents = Similarity.centroids(c, k)
    var means: DataFrame = null
    var lastCp: DataFrame = null
    for (_ <- 0 until iters) {
      val prev = cents
      val stepped = updateStep(emb, id, vec, prev)
      // densify: cells that lost all members keep their old centroid
      val prevRows = prev.select(explode(col("__cents")).as("ct"))
        .select(col("ct.cent_id").cast("int").as("cell"),
          posexplode(col("ct.centroid")).as(Seq("pos", "x")))
        .select(col("cell"), (col("pos") + 1).as("dim"),
          col("x").as("c_prev"))
      // localCheckpoint the k·d-row means each round: without it the
      // next round's plan nests this one's (iterative-lineage blowup,
      // the connectedComponents lesson); the frame is tiny, the cut
      // is what matters. Superseded checkpoints are freed eagerly.
      means = prevRows.join(stepped, Seq("cell", "dim"), "left")
        .select(col("cell"), col("dim"),
          coalesce(col("c"), col("c_prev")).as("c"))
        .localCheckpoint()
      if (lastCp != null) Dedup.unpersistCheckpoint(lastCp)
      lastCp = means
      cents = centroidRow(means)
    }
    means
  }

  /** Final cluster assignment under a fitted (cell, dim, c) table. */
  def assign(emb: DataFrame, id: Column, vec: Column,
             means: DataFrame): DataFrame = {
    val c = emb.select(id.as("vec_id"), vec.cast("array<double>").as("cv"))
    Similarity.assignCells(c, centroidRow(means), "cv", "cell", 1)
  }
}
