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

  test("whitespace contract: vertical tab (U+000B) is NOT a separator " +
      "— matching DuckDB/RE2 \\s, not Java \\s") {
    // 'a\x0Bb' is ONE token in DuckDB string_split_regex '\s+'
    // (verified empirically); the engine pins its whitespace class to
    // the most restrictive verification engine so hash-compared
    // tokenizations can never silently diverge on such text
    val vt = Seq((1L, "a\u000Bb c")).toDF("id", "text")
    val toks = vt.select(TextAnalysis.tokens($"text").as("t"))
      .as[Seq[String]].collect().head
    assert(toks === Seq("a\u000Bb", "c"))
    // the native kernel agrees: 2 tokens, and text_stats counts the
    // VT as a (non-whitespace) token character
    val th = vt.select(graft.functions.token_hashes($"text").as("h"))
      .as[Seq[Long]].collect().head
    assert(th.length === 2)
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

  private def rep(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq((1L, text)).toDF("id", "text").select(c($"text").as("v"))
      .collect().head.get(0)

  test("dupLineFrac / dupParaFrac count repeated segments") {
    val txt = "line one\nline two\nline one\n\nline one"
    // 4 non-blank lines ("line one" x3), 2 distinct -> 1 - 2/4 = 0.5
    assert(rep(txt, TextAnalysis.dupLineFrac) === 0.5)
    // paragraphs: "line one\nline two\nline one" and "line one" -> 0.0
    assert(rep(txt, TextAnalysis.dupParaFrac) === 0.0)
    val para = "aaa\n\naaa\n\nbbb"
    assert(rep(para, TextAnalysis.dupParaFrac) ===
      1.0 - 2.0 / 3.0) // 3 paras, 2 distinct
    assert(rep("", TextAnalysis.dupLineFrac) === null)
  }

  test("dupTokenFrac and dupNgramFrac") {
    assert(rep("a b a b a", TextAnalysis.dupTokenFrac) ===
      1.0 - 2.0 / 5.0)
    // bigrams of (a b a b a): ab ba ab ba -> 2 distinct of 4
    assert(rep("a b a b a", t => TextAnalysis.dupNgramFrac(t, 2)) === 0.5)
    assert(rep("one", t => TextAnalysis.dupNgramFrac(t, 2)) === null)
    assert(rep("all unique words here", TextAnalysis.dupTokenFrac) === 0.0)
  }

  test("redactPii: emails/phones/ips tagged, clean text untouched") {
    val dirty = "mail a.user+x@foo-bar.org or 555-123-4567, " +
      "host 192.168.0.1 done"
    assert(rep(dirty, TextAnalysis.redactPii) ===
      "mail <EMAIL> or <PHONE>, host <IP> done")
    val clean = "no personal data here at all 123"
    assert(rep(clean, TextAnalysis.redactPii) === clean)
    val c = rep(dirty, TextAnalysis.piiCounts)
      .asInstanceOf[org.apache.spark.sql.Row]
    assert((c.getInt(0), c.getInt(1), c.getInt(2)) === ((1, 1, 1)))
  }

  test("topToken: mode with lexicographic tiebreak; char fraction") {
    val t = rep("b b a a c", TextAnalysis.topToken)
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(t.getString(0) === "a" && t.getInt(1) === 2) // tie a/b -> a
    // "xx xx y": top=xx (2 occurrences * 2 chars) / 5 total token chars
    assert(rep("xx xx y", TextAnalysis.topTokenCharFrac) === 4.0 / 5.0)
    assert(rep("", TextAnalysis.topTokenCharFrac) === null)
  }

  test("collocations: bound pairs out-lift frequent-but-independent " +
      "ones; lift is the exact product ratio") {
    // "san francisco" always co-occur (5/5); "the" pairs with many
    // different successors — high counts, low lift
    val docs = Seq(
      "the san francisco fog rolls over the bay every day",
      "the san francisco bridge spans the bay in fog",
      "the san francisco hills rise over the water line",
      "the san francisco ferry crosses the bay at dawn",
      "the san francisco skyline fades into the fog bank"
    ).toDF("text")
    val rows = TextAnalysis.collocations(docs, $"text", minCount = 5)
      .orderBy($"lift".desc, $"a", $"b").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getString(0), top.getString(1)) === (("san", "francisco")))
    // c_ab=5, c_a=5, c_b=5, N=46 tokens -> lift = 5*46/(5*5)
    assert(top.getLong(2) === 5L)
    assert(top.getDouble(5) === 5.0 * 46.0 / 25.0)
  }

  test("tokenEntropy: uniform = ln k, repetition = 0, single token " +
      "= exactly +0.0, empty docs omitted") {
    val docs = Seq(
      (1L, "a b c d"),     // uniform over 4 -> ln 4
      (2L, "a a a a"),     // all mass on one token -> 0
      (3L, "a a b b"),     // uniform over 2 -> ln 2
      (4L, "word"),        // single token -> 0 (and not -0.0)
      (5L, "   ")          // no tokens -> omitted
    ).toDF("id", "t")
    val out = TextAnalysis.tokenEntropy(docs, $"id", $"t")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(math.abs(out(1L)._2 - math.log(4)) < 1e-12)
    assert(out(2L) === ((4L, 0.0)))
    assert(math.abs(out(3L)._2 - math.log(2)) < 1e-12)
    assert(out(4L)._1 === 1L)
    assert(java.lang.Double.doubleToRawLongBits(out(4L)._2) === 0L)
  }
}
