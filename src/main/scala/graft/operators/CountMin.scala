package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key stream, relational form (Cormode &
  * Muthukrishnan 2005, public recipe): d independent hash rows × w
  * buckets; est(x) = min_j sketch[j][h_j(x)] ≥ true(x), with
  * overcount bounded by εN (ε = e/w) at probability 1−(1/e)^d.
  *
  * The 100 TB shape this buys: the sketch is a FIXED d·w-row table no
  * matter the corpus — one partial-aggregating shuffle builds it, and
  * any later frequency probe (spam-token watchlists, trending-key
  * estimates, join-size hints) is a d·|probe|-row broadcast join
  * against it instead of a full re-scan + groupBy of the stream.
  * Sketches from disjoint corpus shards ADD cell-wise (same hashes),
  * so shard-parallel builds merge by a (j, bucket) sum — the
  * mergeability that makes it a streaming/incremental primitive.
  *
  * Hashes are md5-derived (first 16 bits of md5("j_key")) — portable
  * and engine-replayable, so a SQL oracle rebuilds the SAME sketch
  * bit-for-bit and estimates compare with no tolerance. */
object CountMin {

  /** 16-bit md5 bucket of `key` under hash row `j`, modulo `w`. */
  private def bucket(j: Int, key: Column, w: Int): Column =
    pmod(conv(substring(md5(
        concat_ws("_", lit(j), key.cast("string"))
          .cast(org.apache.spark.sql.types.BinaryType)), 1, 4), 16, 10)
      .cast("int"), lit(w))

  /** Build the sketch from a key stream: one row per OCCUPIED
    * (j, bucket) cell with its count (absent cells are zero). One
    * union of d bucket projections over the stream, one partial-agg
    * shuffle; output ≤ d·w rows regardless of input size. */
  def build(keys: DataFrame, key: Column, depth: Int, width: Int)
      : DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    require(width <= 65536, "md5 bucket is 16-bit: width <= 65536")
    (0 until depth).map(j =>
        keys.select(lit(j).as("j"), bucket(j, key, width).as("bucket")))
      .reduce(_ unionAll _)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-join SIZE estimate from two sketches built with the same
    * (depth, width): est = min_j Σ_b a[j][b]·b[j][b] — the sketch
    * inner product, an upper bound on the true Σ_k f_A(k)·f_B(k)
    * (AMS/CMS inner-product estimate, Cormode & Muthukrishnan §4.2).
    * This is the optimizer-facing use: size a prospective join from
    * two fixed-size synopses without touching either input again.
    * Cost: one ≤ d·w-row join of the two sketches. */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame)
      : DataFrame =
    sketchA.withColumnRenamed("n", "__na")
      .join(sketchB.withColumnRenamed("n", "__nb"), Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("__na") * col("__nb")).as("__ip"))
      .agg(min(col("__ip")).as("join_size_est"))

  /** Point-estimate the frequency of each probe key against a built
    * sketch: est = min over the d cells the key hashes to (an absent
    * cell is 0 — the key was never seen under that hash row). The
    * join is d·|probe| rows vs the fixed-size sketch; the sketch side
    * broadcasts. */
  def estimate(sketch: DataFrame, probes: DataFrame, key: Column,
               depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(j =>
        probes.select(key.as("key"), lit(j).as("j"),
          bucket(j, key, width).as("bucket")))
      .reduce(_ unionAll _)
    cells.join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
