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

  /** Per-EVAL-doc contamination SPAN profile (the GPT-3-appendix-style
    * report, token-grain): for each eval/benchmark document, how many of
    * its tokens are covered by word n-grams that also occur in the train
    * corpus, and the longest contiguous contaminated token run. This is
    * the report a release review reads — "eval doc X is 84% contained in
    * the training set, longest verbatim run 212 tokens" — where
    * [[sharedGrams]] only answers "shares ≥1 gram".
    *
    * Scale design (100 TB train, small eval): the eval side is tiny, so
    * its distinct grams broadcast OUT to the train scan; the train side
    * contributes only the grams it has IN COMMON with the eval set
    * (bounded by the eval gram count), which broadcast BACK onto the
    * eval positions. The train corpus is scanned exactly once and never
    * shuffles — both joins are broadcast-hash. Span accounting is the
    * interval-union window (per-doc sort over match positions): covered
    * tokens via the lead-gap formula, longest run via island detection
    * (fixed-length sorted intervals ⇒ running max end = previous end,
    * so adjacency-merge needs only lag).
    *
    * Returns (id, n_tok, n_contaminated, longest_span) — one row per
    * eval doc, zeros for clean docs. */
  def spanProfile(train: DataFrame, trainText: Column,
                  eval: DataFrame, evalId: Column, evalText: Column,
                  n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evalTok = eval.select(evalId.as("id"),
        TextAnalysis.tokens(evalText).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("n_tok"),
        col("__toks"))
      .localCheckpoint() // tiny; feeds positions AND the all-docs frame
    // positional grams: one row per span start (docs shorter than n
    // tokens shingle as their full token string, matching
    // TextAnalysis.shingles short-doc semantics)
    val evalGrams = evalTok.select(col("id"), col("n_tok"),
        posexplode(when(col("n_tok") >= n,
          transform(sequence(lit(0), col("n_tok").cast("int") - n),
            i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
          .otherwise(when(col("n_tok") > 0,
            array(array_join(col("__toks"), " ")))
            .otherwise(array(lit(null).cast("string"))))))
      .filter(col("col").isNotNull)
      .select(col("id"), col("n_tok"), col("pos").cast("long").as("strt"),
        col("col").as("g"))
    val evalSet = evalGrams.select(col("g")).distinct()
    // train grams present in the eval set: bounded by |evalSet|
    val hot = train
      .select(explode(TextAnalysis.shingles(trainText, n)).as("g"))
      .join(broadcast(evalSet), Seq("g"))
      .distinct()
    val wDoc = Window.partitionBy(col("id")).orderBy(col("strt"))
    val marked = evalGrams.join(broadcast(hot), Seq("g"))
      .withColumn("__end",
        least(col("strt") + (n - 1), col("n_tok") - 1))
      .withColumn("__nxt", lead(col("strt"), 1).over(wDoc))
      .withColumn("__ni",
        when(lag(col("strt"), 1).over(wDoc).isNull ||
          col("strt") > least(lag(col("strt"), 1).over(wDoc) + (n - 1),
            col("n_tok") - 1) + 1, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__ni")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val covered = marked.groupBy(col("id"))
      .agg(sum(least(lit(n.toLong), col("n_tok") - col("strt"),
        coalesce(col("__nxt") - col("strt"), lit(n.toLong))))
        .as("__cov"))
    val longest = marked.groupBy(col("id"), col("__isl"))
      .agg((max(col("__end")) - min(col("strt")) + 1).as("__run"))
      .groupBy(col("id")).agg(max(col("__run")).as("__longest"))
    evalTok.select(col("id"), col("n_tok"))
      .join(covered, Seq("id"), "left")
      .join(longest, Seq("id"), "left")
      .select(col("id"), col("n_tok"),
        coalesce(col("__cov"), lit(0L)).as("n_contaminated"),
        coalesce(col("__longest"), lit(0L)).as("longest_span"))
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
