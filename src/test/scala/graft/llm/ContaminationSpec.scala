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

  // ---- spanProfile: token-grain contamination accounting ----

  private lazy val spanTrain = Seq(
    // carries E1's two contaminated regions, separated by a token
    // E1 never contains ("zzz"), so only the regions themselves match
    (10L, "a1 a2 a3 a4 a5 a6 a7 a8 zzz b1 b2 b3 b4 b5 b6 b7 b8 b9"),
    (11L, "short text") // E2's full (sub-8-token) string
  ).toDF("id", "text")

  private lazy val spanEval = Seq(
    // two islands: [0..7] (8 tokens), gap x1..x3, [11..19] (9 tokens,
    // two OVERLAPPING matched grams b1..b8 / b2..b9 that must merge)
    (1L, "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2 x3 b1 b2 b3 b4 b5 b6 b7 b8 b9"),
    (2L, "short text"),   // short doc: full-string gram, full coverage
    (3L, "wholly clean evaluation document nothing shared here at all")
  ).toDF("id", "text")

  test("spanProfile: interval union, island merge, longest run") {
    val out = Contamination.spanProfile(spanTrain, col("text"),
        spanEval, col("id"), col("text"), n = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // E1: 20 tokens, union 8 + 9 = 17 covered, longest merged run 9
    assert(out(1L) === ((20L, 17L, 9L)))
    // E2: short doc matches as its full token string
    assert(out(2L) === ((2L, 2L, 2L)))
    // E3: clean doc reports zeros (and is PRESENT, not dropped)
    assert(out(3L) === ((9L, 0L, 0L)))
  }

  test("spanProfile: overlapping grams never double-count coverage") {
    // eval doc fully contained in train: every start matches; the
    // union must equal n_tok exactly (one island spanning the doc)
    val ev = Seq((7L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("id", "text")
    val tr = Seq((20L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 tail")).toDF("id", "text")
    val out = Contamination.spanProfile(tr, col("text"),
        ev, col("id"), col("text"), n = 8)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out === ((7L, 10L, 10L, 10L)))
  }
}
