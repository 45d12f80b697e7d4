package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark-decontamination semantics: n-gram overlap detection,
  * short-text handling, pass-through of clean docs. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "totally unrelated words nothing shared with any benchmark"),
    (4L, "short text") // < 8 tokens: shingled as the full token string
  ).toDF("id", "text")

  private lazy val evalSet = Seq(
    // contains train-1's first 8 tokens verbatim
    "alpha beta gamma delta epsilon zeta eta theta",
    "short text"
  ).toDF("etext")

  test("sharedGrams flags docs overlapping the eval set") {
    val hits = Contamination.sharedGrams(train, col("id"), col("text"),
        evalSet, col("etext"), n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L)) // 8-gram overlap
    assert(hits.contains(4L)) // short-text full-string overlap
    assert(!hits.contains(2L) && !hits.contains(3L))
  }

  test("decontaminate drops flagged docs, keeps the rest untouched") {
    val out = Contamination.decontaminate(train, col("id"), col("text"),
        evalSet, col("etext"), n = 8)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 3L))
  }

  test("overlap is counted per distinct shared gram") {
    // doc 1 shares exactly 1 distinct 8-gram with eval line 1
    val hits = Contamination.sharedGrams(train, col("id"), col("text"),
        evalSet, col("etext"), n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits(1L) === 1L)
  }
}
