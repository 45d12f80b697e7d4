package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002 /
  * Beyer et al. 2007 "Distinct-value synopses", public recipe): hash
  * every key uniformly into [0, 2⁴⁸), keep the k smallest DISTINCT
  * hash values; with t = h_k/2⁴⁸ the unbiased estimate is (k−1)/t.
  * Under k distinct keys the sketch IS the distinct set — exact.
  *
  * Where the engine's HLL (`approx_count_distinct`, q67) is the
  * black-box scale path, KMV is the PORTABLE one: md5-derived hashes
  * mean a SQL oracle rebuilds the same sketch and the estimate
  * compares bit-for-bit — no tolerance, no probabilistic assertion.
  * Sketches MERGE by re-taking the k smallest of the union (the
  * shard-parallel / streaming form), and the same sketch answers
  * set-union cardinalities for free.
  *
  * Scale shape: the k smallest per partition flow to one TakeOrdered
  * merge (k·partitions rows on the driver-side merge, like any
  * top-k); everything else is row-local hashing. */
object Kmv {

  private val Pow48 = 281474976710656.0 // 2^48 as an exact double

  /** 48-bit md5 hash of a key — uniform, portable, collision odds
    * ~n²/2⁴⁹ (negligible at sketch scale and identical in the
    * oracle's replay either way). */
  def h48(key: Column): Column =
    conv(substring(md5(key.cast("string")
        .cast(org.apache.spark.sql.types.BinaryType)), 1, 12), 16, 10)
      .cast("long")

  /** The sketch: k smallest distinct hash values of the key stream. */
  def sketch(keys: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    keys.select(h48(key).as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Merge shard sketches: k smallest of the union — identical to
    * sketching the concatenated stream. */
  def merge(sketches: Seq[DataFrame], k: Int): DataFrame =
    sketches.reduce(_ unionAll _).distinct()
      .orderBy(col("h")).limit(k)

  /** Distinct-count estimate from a sketch built with this `k`:
    * (k−1)·2⁴⁸/h_k, or the exact count when fewer than k distinct
    * keys exist. One 1-row aggregate. */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("__c"), max(col("h")).as("__hk"))
      .select(
        when(col("__c") < k, col("__c").cast("double"))
          .otherwise(lit((k - 1).toDouble * Pow48) /
            col("__hk").cast("double"))
          .as("distinct_est"))

  /** Containment probe — the FK/inclusion-dependency discovery
    * primitive (Bauckmann et al. / data-profiling practice): the
    * child column's KMV sketch is a uniform sample of its DISTINCT
    * values, so the fraction of its k hashes found in the parent
    * column estimates |child ∩ parent| / |child| — ≈ 1.0 exactly when
    * child ⊆ parent (a foreign key), and near the chance level for
    * unrelated columns. The parent is probed EXACTLY (one k-row
    * semi-join against its hashed values — the parent is never
    * sketched, so a true FK reports containment 1.0 with no sketch
    * error at all); the only estimate is the child's distinct count.
    * Scale shape: one distinct + top-k per child column, one
    * broadcast k-row semi-join per pair — the whole cross-column
    * discovery matrix costs |pairs| tiny probes, never a join of the
    * tables themselves. */
  def containmentProbe(child: DataFrame, childKey: Column,
                       parent: DataFrame, parentKey: Column, k: Int)
      : DataFrame = {
    val sk = sketch(child, childKey, k)
    val hits = sk.join(
      parent.select(h48(parentKey).as("h")).distinct(),
      Seq("h"), "left_semi")
    sk.agg(count(lit(1)).as("k_child")).crossJoin(
        hits.agg(count(lit(1)).as("probe_hits")))
      .crossJoin(estimate(sk, k)
        .withColumnRenamed("distinct_est", "child_distinct_est"))
      .select(col("k_child"), col("probe_hits"),
        col("child_distinct_est"),
        (col("probe_hits").cast("double")
          / col("k_child").cast("double")).as("containment"))
  }

  /** Set-operation estimates from two sketches (Beyer et al. §4 —
    * the theta-sketch recipe): the k smallest of A∪B form the union
    * sketch; ρ = the fraction of those hashes present in BOTH input
    * sketches estimates Jaccard; intersection ≈ ρ · |A∪B|. Every
    * step is a min-k selection or an exact-hash semi-join, so a SQL
    * oracle replays the ESTIMATES bit-for-bit — the property that
    * lets approximate set analytics sit under the same hard
    * correctness gate as exact operators. When both inputs carry
    * fewer than k distinct keys the sketches are the sets and all
    * three outputs are exact. */
  def setEstimates(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = merge(Seq(a, b), k)
    val inBoth = u.join(a, Seq("h"), "left_semi")
      .join(b, Seq("h"), "left_semi")
    u.agg(count(lit(1)).as("__ku")).crossJoin(
        inBoth.agg(count(lit(1)).as("__kb")))
      .crossJoin(estimate(u, k))
      .select(col("distinct_est").as("union_est"),
        (col("__kb").cast("double") / col("__ku").cast("double"))
          .as("jaccard_est"),
        ((col("__kb").cast("double") / col("__ku").cast("double")) *
          col("distinct_est")).as("intersect_est"))
  }
}
