package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: Seq[(String, Double, Boolean)]) =
    Eval.binaryMetrics(rows.toDF("g", "s", "y"), $"g", $"s", $"y")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap

  test("AUC laws: perfect=1, reversed=0, constant-score=0.5") {
    val m = metrics(Seq(
      // perfect: every positive outscores every negative
      ("perf", 0.9, true), ("perf", 0.8, true), ("perf", 0.2, false),
      ("perf", 0.1, false),
      // reversed: every negative outscores every positive
      ("rev", 0.9, false), ("rev", 0.1, true),
      // constant: one tied block -> average rank -> 0.5 exactly
      ("const", 0.5, true), ("const", 0.5, false), ("const", 0.5, true)
    ))
    assert(m("perf").getAs[Double]("auc") === 1.0)
    assert(m("rev").getAs[Double]("auc") === 0.0)
    assert(m("const").getAs[Double]("auc") === 0.5)
  }

  test("tie correction: half-credit for a pos/neg tied pair") {
    // pos at .9 beats neg at .1 (1 win); pos at .5 ties neg at .5
    // (half win) -> U = 1.5 + 1 (the .9 pos also beats the .5 neg)
    // ... enumerate: pairs = 2 pos x 2 neg = 4; wins: (.9,.1)=1,
    // (.9,.5)=1, (.5,.1)=1, (.5,.5)=0.5 -> AUC = 3.5/4
    val m = metrics(Seq(
      ("t", 0.9, true), ("t", 0.5, true), ("t", 0.5, false),
      ("t", 0.1, false)))
    assert(m("t").getAs[Double]("auc") === 3.5 / 4.0)
  }

  test("confusion counts + derived ratios at threshold 0.5") {
    val m = metrics(Seq(
      ("c", 0.9, true), ("c", 0.6, false), ("c", 0.5, true),
      ("c", 0.4, true), ("c", 0.1, false)))
    val r = m("c")
    assert(r.getAs[Long]("tp") === 2 && r.getAs[Long]("fp") === 1 &&
           r.getAs[Long]("fn") === 1 && r.getAs[Long]("tn") === 1)
    assert(r.getAs[Long]("npos") === 3 && r.getAs[Long]("nneg") === 2)
    assert(r.getAs[Double]("precision") === 2.0 / 3.0)
    assert(r.getAs[Double]("recall") === 2.0 / 3.0)
    assert(r.getAs[Double]("accuracy") === 3.0 / 5.0)
  }

  test("degenerate groups: single-class AUC and empty-denominator " +
       "ratios are null, counts still exact") {
    val m = metrics(Seq(
      ("allpos", 0.9, true), ("allpos", 0.1, true),
      ("allneg", 0.2, false), ("allneg", 0.3, false)))
    assert(m("allpos").isNullAt(m("allpos").fieldIndex("auc")))
    assert(m("allneg").isNullAt(m("allneg").fieldIndex("auc")))
    // allneg at threshold .5: no predicted positives -> precision null
    assert(m("allneg").isNullAt(m("allneg").fieldIndex("precision")))
    assert(m("allneg").isNullAt(m("allneg").fieldIndex("recall")))
    // allpos: the .9 doc clears the threshold, the .1 doc does not
    assert(m("allpos").getAs[Double]("recall") === 0.5)
  }

  test("prCurve laws: monotone recall, endpoint counts, and agreement " +
       "with binaryMetrics at threshold 0.5") {
    val rows = Seq(
      ("g", 0.9, true), ("g", 0.7, false), ("g", 0.6, true),
      ("g", 0.5, true), ("g", 0.3, false), ("g", 0.1, false))
    val df = rows.toDF("g", "s", "y")
    val curve = Eval.prCurve(df, $"g", $"s", $"y")
      .orderBy($"thr".desc).collect()
    // recall is non-decreasing as the threshold drops; final point
    // has tp = npos and fp = nneg
    val recalls = curve.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
    assert(curve.last.getAs[Long]("tp") === 3 &&
           curve.last.getAs[Long]("fp") === 3)
    // the curve point at thr=0.5 is exactly binaryMetrics' confusion
    val at05 = curve.find(_.getAs[Double]("thr") === 0.5).get
    val bm = Eval.binaryMetrics(df, $"g", $"s", $"y").collect().head
    assert(at05.getAs[Long]("tp") === bm.getAs[Long]("tp"))
    assert(at05.getAs[Long]("fp") === bm.getAs[Long]("fp"))
    assert(at05.getAs[Double]("precision") ===
      bm.getAs[Double]("precision"))
  }

  test("calibrationBins: bin assignment, exact rates, deterministic " +
       "mean equals the plain mean") {
    val df = Seq((0.05, false), (0.12, false), (0.18, true),
      (0.95, true), (0.99, true)).toDF("s", "y")
    val bins = Eval.calibrationBins(df, $"s", $"y",
        deterministicMean = true)
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    assert(bins.keySet === Set(0, 1, 9))
    assert(bins(1).getAs[Long]("n") === 2 &&
           bins(1).getAs[Long]("pos") === 1)
    assert(bins(1).getAs[Double]("pos_rate") === 0.5)
    assert(bins(1).getAs[Double]("mean_score") === (0.12 + 0.18) / 2)
    assert(bins(9).getAs[Double]("mean_score") === (0.95 + 0.99) / 2)
    val plain = Eval.calibrationBins(df, $"s", $"y")
      .collect().map(r => r.getAs[Int]("bin") ->
        r.getAs[Double]("mean_score")).toMap
    bins.foreach { case (b, r) =>
      assert(plain(b) === r.getAs[Double]("mean_score")) }
  }

  test("chiSquaredSlots: hand-computed 2x2 contingency, independent " +
       "slot scores ~0, perfectly-predictive slot scores N") {
    // dim 2: slot 0 present iff positive (perfect), slot 1 in all docs
    // (independent -> den has a zero factor -> chi2 null)
    val vecs = Seq(
      (Seq(1.0, 1.0), true), (Seq(2.0, 1.0), true),
      (Seq(0.0, 3.0), false), (Seq(0.0, 1.0), false))
      .toDF("v", "y")
    val m = Eval.chiSquaredSlots(vecs, $"v", $"y")
      .collect().map(r => r.getAs[Int]("b") -> r).toMap
    val s0 = m(0)
    assert(s0.getAs[Long]("n11") === 2 && s0.getAs[Long]("n10") === 0 &&
           s0.getAs[Long]("n01") === 0 && s0.getAs[Long]("n00") === 2)
    // perfect association: chi2 = N = 4
    assert(s0.getAs[Double]("chi2") === 4.0)
    // slot 1 present everywhere: the (n01+n00) margin is 0
    assert(m(1).isNullAt(m(1).fieldIndex("chi2")))
  }

  test("rank window runs over distinct scores, partitioned by group " +
       "(never a global corpus sort)") {
    val df = Eval.binaryMetrics(
      Seq(("a", 0.5, true), ("a", 0.5, false), ("b", 0.7, true))
        .toDF("g", "s", "y"), $"g", $"s", $"y")
    val plan = df.queryExecution.executedPlan.toString
    // the window's partition spec must include the group key
    assert(plan.contains("windowspecdefinition(grp"))
  }
}
