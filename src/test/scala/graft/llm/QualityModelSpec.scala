package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("squash: monotone (0,1) with 0.5 decision point at logit 0") {
    val xs = Seq(-100.0, -1.0, -0.001, 0.0, 0.001, 1.0, 100.0).toDF("x")
    val s = xs.select(QualityModel.squash($"x").as("s"))
      .as[Double].collect()
    assert(s.forall(v => v > 0.0 && v < 1.0))
    assert(s.sorted.sameElements(s)) // monotone in input order
    assert(s(3) === 0.5)
  }

  test("classify orders prose above junk and scores every row") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and it was " +
        "a fine day for the animals of the quiet forest to be out " +
        "in the sun with all of the others on this day. " * 3),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "AAAAAAAA BBBBBBBB CCCCCCCC DDDDDDDD"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = QualityModel.classify(docs, $"text")
      .select($"doc_id", $"score", $"keep")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.size === 4)            // empty text still scored
    assert(out(1L)._1 > out(2L)._1)   // prose beats punctuation wall
    assert(out(1L)._1 > out(3L)._1)   // prose beats caps gibberish
    assert(out(1L)._2)                // prose kept
    assert(!out(2L)._2)               // punctuation wall dropped
  }

  // training corpus: stopword-rich English prose (label 1) vs
  // punctuation/caps junk (label 0) — separable on the feature set
  private def trainDocs = Seq(
    ("the cat and the dog sat on the mat with a hat for it was warm", 1.0),
    ("it is a fine day and the sun was out with all of the birds", 1.0),
    ("this is the house that it was in for a day and a night", 1.0),
    ("!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", 0.0),
    ("AAAA BBBB CCCC DDDD EEEE FFFF GGGG", 0.0),
    ("zzzzzzzzzzzz qqqqqqqqqqqq xxxxxxxxxxxx", 0.0)
  ).toDF("text", "y")

  test("gradient: descending it reduces the squared loss; shapes right") {
    def loss(bias: Double, w: Seq[(String, Double)]): Double = {
      val f = QualityModel.features($"text").toMap
      trainDocs.select(
          (pow(QualityModel.squash(QualityModel.linear(bias,
            w.map { case (n, wt) => (f(n), wt) })) - $"y", 2) / 2)
            .as("l"))
        .agg(avg($"l")).as[Double].collect().head
    }
    val g = QualityModel.gradient(trainDocs, $"text", $"y",
        bias = 0.0,
        weights = QualityModel.DefaultWeights.map { case (n, _) => (n, 0.0) })
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g.size === 6 && g.contains("bias"))
    val l0 = loss(0.0, QualityModel.DefaultWeights.map { case (n, _) =>
      (n, 0.0) })
    // SMALL step: descent only guarantees decrease for small enough
    // lr (mean_word_len's ~10x feature scale makes unit steps overshoot)
    val lr = 0.05
    val stepped = QualityModel.DefaultWeights.map { case (n, _) =>
      (n, -lr * g(n)) }
    val l1 = loss(-lr * g("bias"), stepped)
    assert(l1 < l0, s"a small gradient step must reduce loss: $l0 -> $l1")
  }

  test("fit learns the separation: prose scored above junk, " +
      "sensible signs") {
    val (b, w) = QualityModel.fit(trainDocs, $"text", $"y",
      steps = 60, lr = 4.0)
    val wm = w.toMap
    assert(wm("stopword_ratio") > 0.0,
      "stopwords indicate the positive class")
    assert(wm("punct_ratio") < 0.0, "punctuation walls are negative")
    val scored = QualityModel.classify(trainDocs, $"text",
        bias = b, weights = w)
      .select($"y", $"score")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max,
      s"fit must separate the classes: pos=${pos.toSeq} neg=${neg.toSeq}")
  }

  test("gradient deterministicSum equals the plain-sum form (tolerance)") {
    val g1 = QualityModel.gradient(trainDocs, $"text", $"y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val g2 = QualityModel.gradient(trainDocs, $"text", $"y",
        deterministicSum = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    g1.keys.foreach { k =>
      assert(math.abs(g1(k) - g2(k)) < 1e-12, s"feature $k")
    }
  }

  test("weights are pluggable: zeroed model scores squash(bias) everywhere") {
    val docs = Seq((1L, "anything at all")).toDF("doc_id", "text")
    val s = docs.select(QualityModel.score($"text", bias = 2.0,
        weights = QualityModel.DefaultWeights.map { case (n, _) => (n, 0.0) })
      .as("s")).as[Double].collect().head
    // squash(2.0) = 0.5 + 0.5*(2/3)
    assert(math.abs(s - (0.5 + 0.5 * (2.0 / 3.0))) < 1e-15)
  }
}
