package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation over scored corpora — the measurement
  * half of the quality-model loop ([[QualityModel]] trains and infers;
  * this grades the result against labels). Public recipe: ROC-AUC as
  * the Mann–Whitney U statistic with average ranks for ties (the
  * standard tie-corrected estimator), confusion counts at a fixed
  * threshold.
  *
  * Determinism: every emitted number is EXACT given engine-identical
  * scores. Average ranks are multiples of 1/2; rank sums stay far below
  * 2^53 for any per-group cardinality Spark can window, so summation
  * order cannot perturb them; AUC/precision/recall/accuracy are single
  * divisions of exact integers (or half-integers) — bit-identical
  * across engines, no rounding required.
  *
  * Scale: one groupBy (grp, score) collapses the corpus to distinct
  * score values per group BEFORE any window runs — the rank window
  * partitions by group over that collapsed frame (never a per-row
  * global sort), and the final per-group reduce is map-side
  * combinable. A 100 TB corpus with k sources and s distinct scores
  * per source windows over k·s rows, not N.
  */
object Eval {

  /** Per-group metrics for a binary classifier: (grp, n, npos, nneg,
    * tp, fp, tn, fn, auc, precision, recall, accuracy).
    *
    * AUC is the tie-corrected rank estimator
    *   U = Σ_{positives} avgrank(score) − npos·(npos+1)/2,
    *   AUC = U / (npos·nneg)
    * (null when a group lacks both classes). Confusion counts use
    * `predict = score >= threshold`; precision/recall are null for
    * empty denominators.
    */
  def binaryMetrics(scored: DataFrame, group: Column, score: Column,
                    label: Column, threshold: Double = 0.5): DataFrame = {
    val base = scored.select(group.as("grp"), score.as("s"),
      label.cast("boolean").as("y"))
    // collapse to distinct scores per group: cnt rows, pos positives
    val perScore = base.groupBy(col("grp"), col("s")).agg(
      count(lit(1)).as("cnt"),
      sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("pos"))
    // average rank of a tied block ending at cumulative count `cum`:
    // cum - cnt + (cnt+1)/2  (1-based, ascending score)
    val w = Window.partitionBy(col("grp")).orderBy(col("s"))
    val ranked = perScore
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("avg_rank",
        (col("cum") - col("cnt")).cast("double")
          + (col("cnt") + lit(1L)) / lit(2.0))
    val pred = col("s") >= lit(threshold)
    val agg = ranked.groupBy(col("grp")).agg(
      sum(col("cnt")).as("n"),
      sum(col("pos")).as("npos"),
      (sum(col("cnt")) - sum(col("pos"))).as("nneg"),
      sum(col("pos") * col("avg_rank")).as("__rank_pos"),
      sum(when(pred, col("pos")).otherwise(lit(0L))).as("tp"),
      sum(when(pred, col("cnt") - col("pos")).otherwise(lit(0L))).as("fp"),
      sum(when(!pred, col("cnt") - col("pos")).otherwise(lit(0L))).as("tn"),
      sum(when(!pred, col("pos")).otherwise(lit(0L))).as("fn"))
    agg.select(
      col("grp"), col("n"), col("npos"), col("nneg"),
      col("tp"), col("fp"), col("tn"), col("fn"),
      when(col("npos") > 0 && col("nneg") > 0,
        (col("__rank_pos")
          - col("npos").cast("double") * (col("npos") + lit(1L)) / lit(2.0))
          / (col("npos") * col("nneg")).cast("double"))
        .as("auc"),
      when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
        .as("precision"),
      when(col("npos") > 0,
        col("tp").cast("double") / col("npos").cast("double"))
        .as("recall"),
      ((col("tp") + col("tn")).cast("double") / col("n").cast("double"))
        .as("accuracy"))
  }

  /** Full precision-recall sweep in ONE pass: for every distinct score
    * s per group (each a candidate threshold, predict-positive at
    * score >= s), the confusion counts are cumulative sums over the
    * score-descending distinct-score frame — no per-threshold rescan.
    * Emits (grp, thr, tp, fp, precision, recall); exact integer counts
    * and single-division ratios, same determinism argument as
    * [[binaryMetrics]].
    *
    * Scale: identical shape to [[binaryMetrics]] — the corpus
    * collapses via one map-side-combining groupBy to distinct
    * (grp, score) rows before the window touches anything. */
  def prCurve(scored: DataFrame, group: Column, score: Column,
              label: Column): DataFrame = {
    val base = scored.select(group.as("grp"), score.as("thr"),
      label.cast("boolean").as("y"))
    val perScore = base.groupBy(col("grp"), col("thr")).agg(
      count(lit(1)).as("cnt"),
      sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("pos"))
    val w = Window.partitionBy(col("grp")).orderBy(col("thr").desc)
    val totals = Window.partitionBy(col("grp"))
    perScore
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("cnt") - col("pos")).over(w))
      .withColumn("npos", sum(col("pos")).over(totals))
      .select(col("grp"), col("thr"), col("tp"), col("fp"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("npos") > 0,
          col("tp").cast("double") / col("npos").cast("double"))
          .as("recall"))
  }

  /** Calibration / reliability table: bucket predictions into
    * `bins` equal-width score bins and compare the bin's MEAN
    * PREDICTED score against its EMPIRICAL positive rate — the
    * reliability-diagram data for "does 0.8 mean 80%?".
    *
    * `deterministicMean` (verification surface, same switch as
    * [[QualityModel.gradient]]): fold the VALUE-SORTED collected
    * scores so the mean is bit-identical across engines regardless of
    * partitioning; the default production path is a plain map-side-
    * combining sum (collect_list of a 100 TB bin is not a thing). */
  def calibrationBins(scored: DataFrame, score: Column, label: Column,
                      bins: Int = 10,
                      deterministicMean: Boolean = false): DataFrame = {
    val base = scored.select(score.as("s"),
      label.cast("boolean").as("y"))
    val meanAgg =
      if (deterministicMean)
        aggregate(array_sort(collect_list(col("s"))), lit(0.0d),
          (acc, x) => acc + x) / count(lit(1)).cast("double")
      else sum(col("s")) / count(lit(1)).cast("double")
    base
      .withColumn("bin",
        least(floor(col("s") * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("pos"),
        meanAgg.as("mean_score"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        col("mean_score"))
  }

  /** Chi-squared feature selection over hashed-BoW slots: for every
    * vector slot, the 2×2 presence-vs-label contingency counts and the
    * chi² statistic
    *   N·(n11·n00 − n10·n01)² / ((n11+n10)(n01+n00)(n11+n01)(n10+n00))
    * — the classic filter-method ranking for which hashed features
    * carry label signal (slot-level, so it composes with
    * [[Featurize.hashedBow]] and any downstream linear model).
    *
    * Determinism: the contingency cells are exact integer counts, the
    * numerator/denominator are exact integer products (longs hold them
    * for corpora to ~10⁸ docs; wider engines use exact big integers
    * and cast the SAME value), and chi² is one final division —
    * bit-identical across engines, no rounding.
    *
    * Scale: one explode bounded by nnz (≤ dim per doc) into a
    * map-side-combining groupBy with `dim` keys; totals are a scalar
    * aggregate broadcast back. Nothing shuffles more than dim rows. */
  def chiSquaredSlots(vecs: DataFrame, vec: Column, label: Column)
      : DataFrame = {
    val base = vecs.select(vec.as("v"), label.cast("boolean").as("y"))
    val slots = base
      .select(col("y"), posexplode(col("v")).as(Seq("b", "cnt")))
      .filter(col("cnt") > 0)
      .groupBy(col("b")).agg(
        sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("n11"),
        sum(when(!col("y"), lit(1L)).otherwise(lit(0L))).as("n10"))
    val tot = base.agg(
      sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("npos"),
      sum(when(!col("y"), lit(1L)).otherwise(lit(0L))).as("nneg"))
    slots.crossJoin(broadcast(tot))
      .withColumn("n01", col("npos") - col("n11"))
      .withColumn("n00", col("nneg") - col("n10"))
      .withColumn("__diff",
        col("n11") * col("n00") - col("n10") * col("n01"))
      .withColumn("__den",
        (col("n11") + col("n10")) * (col("n01") + col("n00"))
          * (col("n11") + col("n01")) * (col("n10") + col("n00")))
      .select(col("b"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("__den") > 0,
          ((col("npos") + col("nneg")) * col("__diff") * col("__diff"))
            .cast("double") / col("__den").cast("double"))
          .as("chi2"))
  }
}
