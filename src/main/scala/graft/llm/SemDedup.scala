package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication — the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540; public recipe re-derived in DataFrame terms):
  * cluster embeddings into k cells with a cheap coarse quantizer, then
  * compare pairs ONLY within a cell and drop every vector that has a
  * near-identical cell-mate.
  *
  * Why this survives 100 TB where [[Dedup.bruteForceEmbeddingPairs]]
  * cannot: the all-pairs cost N² becomes Σ|cell|² ≈ N²/k — the
  * clustering bounds the quadratic to cell-sized blocks, and the
  * within-cell self-join is a plain equi-join on `cell` (shuffle both
  * sides by cell id, AQE skew-split handles hot cells). The quantizer
  * is the SAME deterministic one as [[Similarity.ivfTopK]] (the `nlist`
  * lowest-id vectors), so at ingest the cell id can be a partition
  * column shared with the IVF index — one clustering serves both
  * dedup and search.
  *
  * Determinism contract (what the DuckDB oracle replays): assignment
  * ties break to the lower centroid id; a vector is a duplicate iff
  * some LOWER-id vector in the same cell has rounded cosine >=
  * threshold (round-then-compare, as q44); the survivor reported for a
  * duplicate is its lowest-id such neighbour.
  */
object SemDedup {

  /** Nearest-cell assignment: `(id, cv, cell)` — row-local broadcast
    * array math, no shuffle (see [[Similarity.assignCells]]). */
  def assign(emb: DataFrame, id: Column, vec: Column, nlist: Int)
      : DataFrame = {
    val c = emb.select(id.as("vec_id"), vec.cast("array<double>").as("cv"))
    Similarity.assignCells(c, Similarity.centroids(c, nlist), "cv", "cell", 1)
  }

  /** Duplicate pairs: for each duplicate, its cell, lowest-id surviving
    * neighbour, and best (max) cosine to any lower-id cell-mate above
    * the threshold. Output is small (duplicates only), inputs never
    * leave their cell. */
  def duplicates(emb: DataFrame, id: Column, vec: Column,
                 nlist: Int, threshold: Double): DataFrame = {
    // both sides of the within-cell self-join read the assignment; an
    // uncached frame would recompute the featurize/assign chain per
    // side (same persistence discipline as the minhash signature
    // table — (id, vector, cell) only, spills to executor disk)
    val assigned = assign(emb, id, vec, nlist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell"), col("vec_id").as("kept_id"),
      col("cv").as("va"))
    val b = assigned.select(col("cell"), col("vec_id").as("dup_id"),
      col("cv").as("vb"))
    a.join(b, Seq("cell"))
      .filter(col("kept_id") < col("dup_id"))
      .withColumn("cosine", round(Similarity.cosine(col("va"), col("vb")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy(col("cell"), col("dup_id"))
      .agg(min(col("kept_id")).as("kept_id"),
           max(col("cosine")).as("max_cosine"))
      .select(col("cell"), col("dup_id"), col("kept_id"), col("max_cosine"))
  }

  /** Survivors: the corpus minus [[duplicates]] — a narrow left-anti
    * join on the id column (only (cell, dup_id) pairs shuffle; the
    * corpus side is matched by id). */
  def semanticDedup(emb: DataFrame, id: Column, vec: Column,
                    nlist: Int, threshold: Double): DataFrame = {
    val dups = duplicates(emb, id, vec, nlist, threshold)
      .select(col("dup_id"))
    emb.join(dups, id === col("dup_id"), "left_anti")
  }
}
