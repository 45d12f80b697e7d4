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

  test("weights are pluggable: zeroed model scores squash(bias) everywhere") {
    val docs = Seq((1L, "anything at all")).toDF("doc_id", "text")
    val s = docs.select(QualityModel.score($"text", bias = 2.0,
        weights = QualityModel.DefaultWeights.map { case (n, _) => (n, 0.0) })
      .as("s")).as[Double].collect().head
    // squash(2.0) = 0.5 + 0.5*(2/3)
    assert(math.abs(s - (0.5 + 0.5 * (2.0 / 3.0))) < 1e-15)
  }
}
