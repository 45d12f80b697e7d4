package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark engine"),
    (3L, "nothing relevant here"),
    (4L, "rare gem")
  ).toDF("id", "text")

  test("tfidf: higher tf scores higher; no-match docs absent; rare terms weigh more") {
    val s = Relevance.tfidfScores(docs, $"id", $"text",
      Seq("spark", "gem")).as[(Long, Double)].collect().toMap
    assert(s.keySet === Set(1L, 2L, 4L))
    assert(s(1L) > s(2L)) // tf 3 vs 1, same term
    // 'gem' (df=1) outweighs one 'spark' (df=2) occurrence
    assert(s(4L) > s(2L))
  }

  test("bm25: tf saturates, longer docs normalized down") {
    val d2 = Seq(
      (1L, "x " * 50 + "term"),
      (2L, "short term")
    ).toDF("id", "text")
    val s = Relevance.bm25Scores(d2, $"id", $"text", Seq("term"))
      .as[(Long, Double)].collect().toMap
    assert(s(2L) > s(1L)) // same tf, shorter doc wins
    val sat = Relevance.bm25Scores(docs, $"id", $"text", Seq("spark"))
      .as[(Long, Double)].collect().toMap
    // tf=3 scores more than tf=1 but well under 3x (saturation)
    assert(sat(1L) > sat(2L) && sat(1L) < 3 * sat(2L))
  }
}
