package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Text → fixed-dimension vector WITHOUT a model: the feature-hashing
  * trick (hashed bag-of-words). Each token is md5-bucketed into one of
  * `dim` slots and the vector holds per-slot token counts — the
  * classic linear-model/retrieval featurizer, and the bridge from the
  * `documents` table into every embedding-based operator in this
  * package ([[SemDedup]], [[Similarity]], [[KMeans]]) when no learned
  * embedding exists.
  *
  * Portable md5 bucketing (same trick as [[Pipelines.hashBucket]]), so
  * a differential oracle can replay it; counts are small integers, so
  * dot products and norms are EXACT in doubles — downstream cosines
  * are bit-identical across engines regardless of summation order.
  * Counts (not signed hashing): an all-English corpus keeps every
  * vector nonzero (token-less docs drop out), so no NaN cosines, whose
  * comparison semantics differ between engines.
  *
  * Scale shape: explode to (id, bucket), ONE map-side-combining
  * groupBy (key cardinality ≤ docs·dim, dominated by the combine), a
  * per-doc sparse→dense fold that is O(nnz·dim) row-local — the
  * corpus text is read once and never re-shuffled. */
object Featurize {

  /** md5 slot for one token (first 4 hex chars mod dim — max 65535,
    * always non-negative). */
  def tokenBucket(token: Column, dim: Int): Column =
    pmod(conv(substring(md5(token.cast(BinaryType)), 1, 4), 16, 10)
      .cast("int"), lit(dim))

  /** (id, v) hashed bag-of-words vectors; docs with no tokens emit no
    * row. One fused kernel pass per row (graft.functions.hashed_bow)
    * — NO shuffle at all; [[hashedBowRelational]] is the pure-DataFrame
    * twin it is spec-checked against. */
  def hashedBow(docs: DataFrame, id: Column, text: Column, dim: Int)
      : DataFrame =
    docs.select(id.as("doc_id"),
        graft.functions.hashed_bow(text, dim).as("v"))
      .filter(col("v").isNotNull)

  /** Deterministic ±1 sign matrix for [[randomProject]]: sign(i,j) =
    * parity of the first 16 md5 bits of the string "i_j" — the same
    * derivation any engine with md5 can replay, so projections are
    * differentially verifiable (no RNG, no seed state). */
  def projectionSigns(inDim: Int, outDim: Int): Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val hex = digest.digest(s"${i}_$j".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Johnson–Lindenstrauss random projection with the portable ±1
    * matrix (Achlioptas-style database-friendly projection, public
    * recipe): out[j] = Σ_i v[i]·sign(i,j). Cuts `inDim`-dim vectors to
    * `outDim` while approximately preserving pairwise distances —
    * the cheap front-end for clustering/ANN over wider featurizations.
    *
    * The sign matrix is data-independent and tiny (inDim·outDim), so
    * it is embedded in the plan as a literal and the projection is
    * pure row-local arithmetic — zero shuffle, nothing leaves the
    * executors. On integer (BoW) inputs every output component is an
    * exact ±integer sum — bit-identical across engines in any
    * summation order.
    *
    * Where it pays (measured, BENCHMARKS.md "JL-projected ANN"): in
    * front of ITERATIVE consumers — a k-means fit revisits every
    * vector k·iters times and amortizes the one-pass projection — or
    * for very wide featurizations. NOT as a prefilter for a single
    * fused-kernel scan: at dim=64 the HOF projection costs more than
    * the native cosine kernel multiplies it saves, and dense near-dup
    * corpora defeat low-dim candidate ordering (recall 0.63 at the
    * 100× bench). */
  def randomProject(vec: Column, inDim: Int, outDim: Int): Column = {
    val signs = projectionSigns(inDim, outDim)
    val rows = array(signs.map(r => array(r.map(lit): _*)): _*)
    transform(rows, srow =>
      aggregate(zip_with(vec, srow, (x, s) => x * s), lit(0.0),
        (acc, t) => acc + t))
  }

  /** Relational construction of the same vectors (explode → map-side-
    * combining groupBy → row-local sparse→dense fold): the shape a
    * plain-SQL engine uses, kept as the kernel's differential twin and
    * for engines without the native expression. */
  def hashedBowRelational(docs: DataFrame, id: Column, text: Column,
                          dim: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("t"))
      .select(col("doc_id"), tokenBucket(col("t"), dim).as("b"))
    val grouped = toks.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).cast("double").as("val"))
    grouped.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("b"), col("val"))))
        .as("__es"))
      .select(col("doc_id"),
        aggregate(col("__es"), array_repeat(lit(0.0), dim),
          (acc, e) => transform(acc, (v, i) =>
            when(i === e.getField("b"), e.getField("val")).otherwise(v)))
          .as("v"))
  }

  /** Smoothed target encoding of a categorical column — the standard
    * tabular-ML feature (micci-barreca 2001): each category's encoded
    * value is its target mean shrunk toward the global mean with
    * pseudo-count `m`, enc = (Σ_cat + m·μ) / (n_cat + m), μ = S/N.
    * Rare categories land near μ (no overfit on 3-row categories),
    * frequent ones near their own mean.
    *
    * Determinism: `target` must be INTEGER-valued (cents etc.) so
    * every sum is exact in any aggregation order; the encoding is
    * then three pinned-order IEEE ops (one division for μ, one
    * multiply-add, one final division) — bit-identical across
    * engines, hash-comparable unrounded. Scale shape: one
    * category-keyed aggregation + a broadcast of the 2-scalar global
    * frame; the encoder table is |categories| rows, broadcast back
    * cheaply wherever the feature is applied. */
  def targetEncode(rel: DataFrame, category: Column, target: Column,
                   m: Int): DataFrame = {
    val base = rel.select(category.as("cat"), target.as("t"))
    val per = base.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("__sum"))
    val glob = base.agg(count(lit(1)).as("__N"),
      sum(col("t")).as("__S"))
    per.crossJoin(broadcast(glob))
      .select(col("cat"), col("n"),
        ((col("__sum").cast("double")
            + lit(m.toDouble) * (col("__S").cast("double")
              / col("__N").cast("double")))
          / (col("n") + lit(m)).cast("double")).as("enc"))
  }
}
