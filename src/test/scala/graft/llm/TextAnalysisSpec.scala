package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "The quick brown fox, it was the best of times!"),
    (2L, "el perro y el gato en la casa de los vecinos"),
    (3L, "der Hund und die Katze sind nicht mit der Maus"),
    (4L, "le chat est dans la maison et le chien est dans le jardin"),
    (5L, "中文文本处理测试"),
    (6L, ""),
    (7L, "zzz qqq xxx yyy www")
  ).toDF("id", "text")

  private def one[T](id: Long, c: org.apache.spark.sql.Column): T =
    df.filter($"id" === id).select(c.as("v")).collect().head
      .getAs[T]("v")

  test("token count") {
    assert(one[Int](1L, TextAnalysis.tokenCount($"text")) === 10)
    assert(one[Int](6L, TextAnalysis.tokenCount($"text")) === 0)
  }

  test("language id: stopword argmax + CJK script") {
    val preds = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) === "en")
    assert(preds(2L) === "es")
    assert(preds(3L) === "de")
    assert(preds(4L) === "fr")
    assert(preds(5L) === "zh")
    assert(preds(7L) === "und")
  }

  test("quality score ranges and orders sensibly") {
    val q1 = one[Double](1L, TextAnalysis.qualityScore($"text"))
    val q7 = one[Double](7L, TextAnalysis.qualityScore($"text"))
    assert(q1 > q7) // fluent English beats keyword soup
    assert(q1 <= 1.0 && q7 >= 0.0)
  }

  test("shingles: n-grams distinct, short texts fall back to whole text") {
    val sh = df.filter($"id" === 1L)
      .select(TextAnalysis.shingles($"text", 3).as("v"))
      .collect().head.getSeq[String](0)
    assert(sh.contains("the quick brown"))
    val short = Seq((1L, "one two")).toDF("id", "text")
      .select(TextAnalysis.shingles($"text", 3).as("v"))
      .collect().head.getSeq[String](0)
    assert(short === Seq("one two"))
  }

  test("fingerprint: equal for equal text, stable across runs") {
    val f1 = one[Long](1L, TextAnalysis.fingerprint($"text"))
    val f1b = one[Long](1L, TextAnalysis.fingerprint($"text"))
    assert(f1 === f1b)
    val f4 = one[Long](2L, TextAnalysis.fingerprint($"text"))
    assert(f1 !== f4)
  }

  test("native text_stats fast path agrees with the column-math forms") {
    val docs = catalog.table("documents").limit(100)
    val fast = TextAnalysis.withTextStats(docs, col("text"))
      .select("doc_id", "n_tokens", "punct_ratio", "mean_word_len")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val slow = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("t"),
        TextAnalysis.punctRatio(col("text")).as("p"),
        TextAnalysis.meanWordLen(col("text")).as("m"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
    fast.foreach { case (id, (t, p, m)) =>
      val (t2, p2, m2) = slow(id)
      assert(t === t2, s"tokens doc $id")
      (p, p2) match {
        case (Some(a: Double), Some(b: Double)) =>
          assert(math.abs(a - b) < 1e-9, s"punct doc $id")
        case other => assert(p === p2, s"punct doc $id: $other")
      }
      (m, m2) match {
        case (Some(a: Double), Some(b: Double)) =>
          assert(math.abs(a - b) < 1e-9, s"mwl doc $id")
        case other => assert(m === m2, s"mwl doc $id: $other")
      }
    }
  }

  test("bpeish token count >= word count for long words") {
    val n = one[Long](7L, TextAnalysis.bpeishTokenCount($"text"))
    assert(n === 5L)
    val long = Seq((1L, "internationalization")).toDF("id", "text")
      .select(TextAnalysis.bpeishTokenCount($"text").as("v"))
      .as[Long].head()
    assert(long === 4L) // ceil(20/6)
  }
}
