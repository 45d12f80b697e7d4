package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding VOCABULARY INDUCTION (Sennrich et al.
  * 2016, public recipe re-derived in DataFrame terms). BPE training is
  * inherently iterative — each merge depends on the counts produced by
  * the previous merge — so the shape is: a DISTRIBUTED pair count per
  * round, a single-row top-1 collect (the merge rule), and a row-local
  * re-segmentation applying the broadcast rule. The driver holds only
  * the merge table (numMerges rows); the corpus-sized state is the
  * (word, freq, symbols) frame, which never leaves the executors.
  *
  * Scale notes for the 100 TB story:
  *  - training runs on the WORD-FREQUENCY table (distinct words ×
  *    counts), not the corpus: one groupBy over the corpus up front,
  *    then every round's cost is |vocab|, millions not billions;
  *  - the per-round count is a map-side-combining groupBy on (a,b)
  *    pairs exploded from symbol arrays — the classic word-count
  *    shape, partial aggregation does the heavy lifting;
  *  - re-segmentation is a pure higher-order fold per word, no
  *    shuffle; lineage is cut with localCheckpoint every few rounds
  *    (the same discipline as [[Dedup.connectedComponents]]).
  */
object Bpe {

  /** (word, freq) table from a corpus text column — the one
    * corpus-sized shuffle in BPE training. */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial segmentation: a word is its character sequence (the
    * end-of-word is implied by the array end; a production tokenizer
    * would append a marker symbol — same plumbing). */
  def initSymbols(word: Column): Column =
    filter(split(word, ""), s => length(s) > 0)

  /** Adjacent-pair counts over a symbols column, weighted by word
    * frequency: the per-round statistic (and, standalone, the q99
    * oracle surface). Guarded sequence: single-symbol words emit no
    * pairs (sequence(1,0) would be DESCENDING, not empty). */
  def pairCounts(words: DataFrame, symbols: Column, freq: Column)
      : DataFrame =
    words
      .select(symbols.as("__sym"), freq.as("__freq"))
      .select(explode(when(size(col("__sym")) >= 2,
        transform(sequence(lit(1), size(col("__sym")) - 1),
          i => struct(
            element_at(col("__sym"), i).as("a"),
            element_at(col("__sym"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>")))
        .as("p"), col("__freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("__freq")).as("pair_freq"))

  /** One greedy left-to-right merge pass: every non-overlapping (a,b)
    * adjacency becomes the fused symbol a+b. Pure fold over the array
    * (aggregate HOF) — row-local, codegen'd, no UDF. "aaa" under
    * (a,a) → ["aa","a"], matching the sequential reference scan: a
    * just-fused symbol never re-fuses with the next element in the
    * same pass. */
  def mergePair(symbols: Column, a: String, b: String): Column = {
    val fused = a + b
    aggregate(symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `numMerges` merge rules; returns the ordered merge table.
    * Each round: distributed weighted pair count → top-1 (freq desc,
    * then (a,b) asc for determinism) → broadcast re-segmentation.
    * Stops early when no pair occurs twice. */
  def train(spark: SparkSession, docs: DataFrame, text: Column,
            numMerges: Int, checkpointEvery: Int = 8)
      : Seq[(String, String, Long)] = {
    var words = wordFreqs(docs, text)
      .select(col("word"), col("freq"),
        initSymbols(col("word")).as("symbols"))
      .localCheckpoint()
    // the previous CHECKPOINT is tracked separately from the working
    // frame: between checkpoints `words` is a plan over it, so the
    // superseded blocks are freed only once the next checkpoint
    // materializes (same discipline as Dedup.connectedComponents)
    var lastCp = words
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = pairCounts(words, col("symbols"), col("freq"))
        .filter(col("pair_freq") >= 2)
        .orderBy(col("pair_freq").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b, f) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((a, b, f))
        val next = words.withColumn("symbols",
          mergePair(col("symbols"), a, b))
        words =
          if ((round + 1) % checkpointEvery == 0) {
            val cp = next.localCheckpoint()
            Dedup.unpersistCheckpoint(lastCp)
            lastCp = cp
            cp
          } else next
        round += 1
      }
    }
    Dedup.unpersistCheckpoint(lastCp)
    merges.toSeq
  }

  /** Apply an ordered merge table to a symbols column (inference-side
    * segmentation: fold the rules in training order). */
  def applyMerges(symbols: Column, merges: Seq[(String, String, Long)])
      : Column =
    merges.foldLeft(symbols) { case (s, (a, b, _)) => mergePair(s, a, b) }
}
