package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: flag training
  * documents that share any word n-gram with an evaluation/benchmark
  * set (the standard n-gram decontamination rule — GPT-3 appendix C /
  * PaLM-style 8-gram overlap, public recipe re-derived).
  *
  * Scale design (100 TB train, small eval set):
  *  - the EVAL index (distinct n-grams of the benchmark set) is tiny —
  *    thousands of docs — and is broadcast, so the train side is ONE
  *    scan: explode distinct shingles, hash-join against the broadcast,
  *    re-aggregate per doc. No shuffle of the corpus, no self-join.
  *  - shingles are the same word n-grams as the dedup family
  *    ([[TextAnalysis.shingles]]), so a pipeline computing both shares
  *    the tokenize pass.
  */
object Contamination {

  /** Per-train-doc contamination: (id, n_shared_grams) for every train
    * doc sharing >= 1 word n-gram with the eval set. Docs shorter than
    * `n` tokens are shingled as their full token string (matching
    * [[TextAnalysis.shingles]]), so short exact copies still match.
    *
    * `hashedShingles` (default): both sides shingle through the native
    * single-pass 64-bit kernel and the join is on longs — hash equality
    * ≡ gram equality (collisions ~1e-19/pair), so shared-gram counts
    * are identical to the string join, at a fraction of the cost (the
    * string path re-evaluates interpreted HOF lambdas per gram;
    * measured ~5× slower). Set false only when the matching grams
    * themselves must be surfaced. */
  def sharedGrams(train: DataFrame, trainId: Column, trainText: Column,
                  eval: DataFrame, evalText: Column, n: Int = 8,
                  hashedShingles: Boolean = true): DataFrame = {
    def grams(text: Column): Column =
      if (hashedShingles) TextAnalysis.shingleHashes(text, n)
      else TextAnalysis.shingles(text, n)
    val evalGrams = eval.select(explode(grams(evalText)).as("g"))
      .distinct()
    val trainGrams = train
      .select(trainId.as("id"), explode(grams(trainText)).as("g"))
    trainGrams.join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Decontaminate: drop training docs sharing any word n-gram with the
    * eval set; everything else passes through untouched. */
  def decontaminate(train: DataFrame, trainId: Column, trainText: Column,
                    eval: DataFrame, evalText: Column, n: Int = 8)
      : DataFrame = {
    val hits = sharedGrams(train, trainId, trainText, eval, evalText, n)
      .select(col("id").as("__contaminated"))
    train.join(hits, trainId === col("__contaminated"), "left_anti")
  }
}
