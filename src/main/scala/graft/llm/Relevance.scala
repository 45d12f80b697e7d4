package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level term-relevance scoring: TF-IDF and BM25 over a bag of
  * query terms (public textbook formulas — Robertson/Spärck Jones).
  *
  * Scale design (100 TB): the token stream is filtered to the query
  * terms BEFORE the explode leaves the row (array filter against a
  * literal set), so the only shuffled rows are (doc, query-term) hits —
  * a vanishing fraction of the corpus. Document frequencies and the
  * corpus-size scalars aggregate from that filtered stream (tiny) and
  * come back as broadcasts; nothing re-shuffles the corpus.
  */
object Relevance {

  /** Full-vocabulary corpus term statistics: (term, df, cf) — document
    * frequency and collection frequency, the serving tables behind
    * idf/BM25 and index-size planning. One explode + one term-keyed
    * aggregate (map-side combinable); the result is VOCABULARY-sized,
    * not corpus-sized. */
  def termStats(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("cf"))

  /** Merge a persisted stats table with a new batch's stats: both df
    * and cf are plain sums as long as a doc never spans batches — the
    * additive-count merge that lets a 100 TB index absorb a daily
    * delta without re-reading history ([[LangModel.mergeUnigrams]]'s
    * discipline applied to the retrieval index). */
  def mergeTermStats(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))

  /** Per-document TF-IDF scores for `terms`: sum over matched terms of
    * tf × (ln((N+1)/(df+1)) + 1). Docs matching no term are absent. */
  def tfidfScores(docs: DataFrame, id: Column, text: Column,
                  terms: Seq[String]): DataFrame = {
    val tf = termFreqs(docs, id, text, terms)
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(n))
      .withColumn("__idf",
        log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0)
      .groupBy(col("id"))
      .agg(sum(col("tf") * col("__idf")).as("score"))
  }

  /** BM25 (k1/b standard defaults): idf_bm25 × tf·(k1+1) /
    * (tf + k1·(1−b+b·len/avglen)), idf_bm25 = ln(1+(N−df+0.5)/(df+0.5)).
    * `len` is the doc's token count; avglen the corpus mean. */
  def bm25Scores(docs: DataFrame, id: Column, text: Column,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    // `__len` rides along from termFreqs' pre-explode projection, so
    // lengths exist ONLY for docs that matched a query term — no
    // full-corpus (id, len) frame is ever built or shuffled
    val tf = termFreqs(docs, id, text, terms)
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // avglen as explicit long-sum / count (not avg()): both engines
    // then do ONE double division on exact integers — bit-identical —
    // where avg()'s internal accumulation order is engine-specific
    val scal = docs.agg(count(lit(1)).as("__n"),
      (sum(TextAnalysis.tokenCount(text)).cast("double") /
        count(lit(1))).as("__avglen"))
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (k1 + 1) /
      (col("tf") + (col("__len") / col("__avglen") * b + (1 - b)) * k1)
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(scal))
      .groupBy(col("id"))
      .agg(sum(idf * norm).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009, public
    * recipe): fuse N (id, score) rankings into one —
    * rrf(d) = Σ_i 1/(k + rank_i(d)), documents absent from a ranking
    * contribute nothing. Ranks are row_numbers by (score desc, id asc)
    * — CALLERS should pre-round engine-dependent scores (ln-based
    * tf-idf/BM25) so a last-ULP difference can never flip a rank; the
    * fused score itself is a fixed-order sum of exact IEEE divisions,
    * hash-comparable unrounded.
    *
    * `partitionCols` scopes ranks (and the id join) per group — the
    * per-query form. Without it the window is GLOBAL: correct only for
    * bounded rescoring inputs (top-k lists), not corpus-wide frames —
    * the same single-partition hazard as any global row_number. Output:
    * (partitionCols…, id, rank_0…rank_{n-1}, rrf). */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k: Int = 60,
                           partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankings.nonEmpty, "need at least one ranking")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val ranked = rankings.zipWithIndex.map { case (r, i) =>
      r.select((partitionCols :+ "id").map(col) :+
        row_number().over(w0.orderBy(col("score").desc, col("id").asc))
          .as(s"rank_$i"): _*)
    }
    val keys = partitionCols :+ "id"
    val joined = ranked.reduce((a, b) => a.join(b, keys, "full_outer"))
    val terms = rankings.indices.map(i =>
      when(col(s"rank_$i").isNotNull,
        lit(1.0) / (lit(k.toDouble) + col(s"rank_$i")))
        .otherwise(lit(0.0)))
    joined.withColumn("rrf", terms.reduce(_ + _))
  }

  /** (id, __len, tok, tf) for tokens ∈ terms — the filter runs inside
    * the row's token array, so only query-term hits are ever exploded;
    * the doc's token count is emitted from the same projection (`__len`
    * is functionally dependent on `id`, so grouping by both changes
    * nothing) for consumers that need length normalization. */
  private def termFreqs(docs: DataFrame, id: Column, text: Column,
                        terms: Seq[String]): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    docs.select(id.as("id"),
        TextAnalysis.tokenCount(text).cast("double").as("__len"),
        explode(filter(TextAnalysis.tokens(text),
          t => array_contains(termArr, t))).as("tok"))
      .groupBy(col("id"), col("__len"), col("tok"))
      .agg(count(lit(1)).as("tf"))
  }
}
