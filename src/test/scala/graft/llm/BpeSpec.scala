package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePair: greedy left-to-right, no re-fuse within a pass") {
    val df = Seq(
      Seq("a", "a", "a"),         // (a,a): first two fuse, third stays
      Seq("a", "b", "a", "b"),    // (a,b): both adjacencies fuse
      Seq("b", "a"),              // no (a,b) adjacency
      Seq.empty[String]
    ).toDF("s")
    val out = df.select(Bpe.mergePair($"s", "a", "a").as("m")).as[Seq[String]]
      .collect()
    assert(out(0) === Seq("aa", "a"))
    val out2 = df.select(Bpe.mergePair($"s", "a", "b").as("m")).as[Seq[String]]
      .collect()
    assert(out2(1) === Seq("ab", "ab"))
    assert(out2(2) === Seq("b", "a"))
    assert(out2(3) === Seq.empty)
  }

  test("pairCounts: frequency-weighted, single-symbol words emit none") {
    val words = Seq(
      (Seq("l", "o", "w"), 5L),
      (Seq("l", "o", "w", "e", "r"), 2L),
      (Seq("x"), 100L) // no pairs
    ).toDF("symbols", "freq")
    val m = Bpe.pairCounts(words, $"symbols", $"freq")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(m(("l", "o")) === 7L)
    assert(m(("o", "w")) === 7L)
    assert(m(("w", "e")) === 2L)
    assert(m(("e", "r")) === 2L)
    assert(!m.contains(("x", "x")))
  }

  test("train: reproduces the classic low/lower/newest merge order") {
    // Sennrich-style toy corpus as repeated words; freqs via repetition
    val docs = Seq(
      ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val merges = Bpe.train(spark, docs, $"text", numMerges = 4)
    // round 1: "es" occurs 6+3=9 times (newest+widest) — the top pair
    // (ties under (freq desc, a asc, b asc): es=9, st=9 -> "es" wins)
    assert(merges.head._1 === "e" && merges.head._2 === "s")
    assert(merges.head._3 === 9L)
    // round 2: "es"+"t" = 9 again
    assert(merges(1) === ("es", "t", 9L))
    // every later merge frequency is <= the earlier one
    assert(merges.sliding(2).forall(w => w(0)._3 >= w(1)._3))
    // applying the merge table re-segments "newest" into few symbols
    val seg = Seq("newest").toDF("w")
      .select(Bpe.applyMerges(Bpe.initSymbols($"w"), merges).as("s"))
      .as[Seq[String]].collect().head
    assert(seg.contains("est"))
    assert(seg.length < 7)
  }

  test("train: stops early when no pair repeats") {
    val docs = Seq("ab cd ef").toDF("text")
    val merges = Bpe.train(spark, docs, $"text", numMerges = 10)
    assert(merges.isEmpty)
  }

  test("LAW: batched training reproduces the sequential merge table " +
      "on the classic corpus") {
    val docs = Seq(
      ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
    ).toDF("text")
    val sequential = Bpe.train(spark, docs, $"text", numMerges = 8)
    val batched = Bpe.train(spark, docs, $"text", numMerges = 8,
      batchSize = 4)
    assert(batched === sequential,
      s"batched $batched must equal sequential $sequential")
  }

  test("LAW: encoding is lossless — symbol concat reproduces the word") {
    // merges only FUSE adjacent symbols, so however many rules are
    // applied in whatever order, concatenating a word's encoded
    // symbols must reproduce the word exactly (q129 leans on this:
    // the token table is a re-partition of the corpus characters)
    val rnd = new scala.util.Random(7)
    val corpus = (1 to 40).map { _ =>
      (1 to (2 + rnd.nextInt(4))).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString
      }.mkString(" ")
    }
    val docs = corpus.toDF("text")
    val merges = Bpe.train(spark, docs, $"text", numMerges = 6,
      batchSize = 3)
    val bad = Bpe.wordFreqs(docs, $"text")
      .select($"word",
        concat_ws("", Bpe.applyMerges(Bpe.initSymbols($"word"), merges))
          .as("rejoined"))
      .filter($"word" =!= $"rejoined")
      .count()
    assert(bad === 0L)
  }

  test("LAW: batched == sequential on randomized corpora (seeded)") {
    // the prefix/ceiling acceptance rule makes batching EXACT, not
    // approximate — so equality must hold on arbitrary corpora, not
    // just the classic one. Seeded generator: failures reproduce.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val letters = "abcde"
      val words = (1 to 30).map { _ =>
        val len = 2 + rnd.nextInt(5)
        (1 to len).map(_ => letters(rnd.nextInt(letters.length))).mkString
      }
      val docs = Seq(words.mkString(" ")).toDF("text")
      val sequential = Bpe.train(spark, docs, $"text", numMerges = 10)
      val batched = Bpe.train(spark, docs, $"text", numMerges = 10,
        batchSize = 5)
      assert(batched === sequential,
        s"trial $trial diverged: corpus=${words.mkString(" ")}\n" +
          s"batched   = $batched\nsequential = $sequential")
    }
  }

  test("LAW: trainLocal == sequential distributed training on the " +
      "classic AND randomized corpora (the production driver-side " +
      "merge loop over the Heaps-bounded word table — r15, after " +
      "BpeBench zipf measured 494 driver rounds for 1000 rules)") {
    val classic = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest newest widest widest widest").toDF("text")
    assert(Bpe.trainLocal(spark, classic, $"text", numMerges = 10) ===
      Bpe.train(spark, classic, $"text", numMerges = 10))
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val letters = "abcde"
      val words = (1 to 30).map { _ =>
        val len = 2 + rnd.nextInt(5)
        (1 to len).map(_ =>
          letters(rnd.nextInt(letters.length))).mkString
      }
      val docs = Seq(words.mkString(" ")).toDF("text")
      val local = Bpe.trainLocal(spark, docs, $"text", numMerges = 12)
      val sequential = Bpe.train(spark, docs, $"text", numMerges = 12)
      assert(local === sequential,
        s"trial $trial diverged: corpus=${words.mkString(" ")}\n" +
          s"local      = $local\nsequential = $sequential")
    }
    // the driver-budget guard fails LOUDLY, naming the fallback
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(spark, classic, $"text", numMerges = 2,
        maxWords = 2L)
    }
    assert(e.getMessage.contains("distributed trainer"))
  }

  test("batched rounds actually batch (fewer rounds than merges)") {
    // count pair-count jobs indirectly: with disjoint high-frequency
    // pairs the first round must accept several rules at once — the
    // classic corpus has es=9, st=9 overlapping, so use one where the
    // top pairs share no symbols
    val docs = Seq(("ab " * 9) + ("cd " * 7) + ("ef " * 5)).toDF("text")
    val batched = Bpe.train(spark, docs, $"text", numMerges = 3,
      batchSize = 3)
    val sequential = Bpe.train(spark, docs, $"text", numMerges = 3)
    assert(batched === sequential)
    assert(batched.map(m => (m._1, m._2)) ===
      Seq(("a", "b"), ("c", "d"), ("e", "f")))
  }

  test("LAW: chunked vocabLengths ≡ one-expression applyMerges per " +
      "distinct word (the production-rule-count encode path, with " +
      "chunk boundaries landing mid-merge-table)") {
    val docs = Seq(
      "low lower lowest newest widest low low newest",
      "the lowest of the low widest wide wide").toDF("text")
    val merges = Bpe.train(spark, docs, $"text", numMerges = 9,
      batchSize = 3)
    assert(merges.size >= 5, "fixture must produce several rules")
    // chunk=2 forces several materialization boundaries inside the
    // rule table — the law is that cut placement cannot matter
    val chunked = Bpe.vocabLengths(spark, docs, $"text", merges,
        chunkRules = 2)
      .as[(String, Long)].collect().toMap
    val direct = docs
      .select(explode(TextAnalysis.tokens($"text")).as("word"))
      .distinct()
      .select($"word", size(Bpe.applyMerges(
        Bpe.initSymbols($"word"), merges)).cast("long").as("wn"))
      .as[(String, Long)].collect().toMap
    assert(chunked === direct)
    assert(chunked.keySet.contains("low") && chunked("low") >= 1L)
  }
}
