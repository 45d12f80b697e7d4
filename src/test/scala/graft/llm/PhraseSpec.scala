package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Phrase-index edge cases the oracle query doesn't exercise:
  * repeated tokens inside the phrase, overlapping occurrences, and
  * phrases with an absent token. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "cat cat cat"),
    (3L, "on the on the on the"),
    (4L, "nothing relevant here")
  ).toDF("doc_id", "text")

  private lazy val idx = Phrase.postings(docs, $"doc_id", $"text")

  private def occ(phrase: String*): Map[Long, Long] =
    Phrase.phraseOccurrences(idx, phrase)
      .as[(Long, Long)].collect().toMap

  test("simple phrase: one occurrence, correct doc") {
    assert(occ("cat", "sat") === Map(1L -> 1L))
  }

  test("repeated token inside the phrase (overlapping starts count)") {
    // "cat cat cat": starts at 0 and 1
    assert(occ("cat", "cat") === Map(2L -> 2L))
  }

  test("phrase with a REPEATED bigram across the doc") {
    assert(occ("on", "the") === Map(1L -> 1L, 3L -> 3L))
  }

  test("stopword-anchored phrase picks the rarest anchor and still " +
      "answers exactly") {
    assert(occ("sat", "on", "the") === Map(1L -> 1L))
  }

  test("absent token -> empty result, not an error") {
    assert(occ("unicorn", "the").isEmpty)
  }

  private def search(must: Seq[String], not: Seq[String]): Set[Long] =
    Phrase.booleanSearch(idx, must, not).as[Long].collect().toSet

  test("boolean search: must-intersection, mustNot-exclusion") {
    assert(search(Seq("the"), Seq.empty) === Set(1L, 3L))
    assert(search(Seq("the", "cat"), Seq.empty) === Set(1L))
    assert(search(Seq("the"), Seq("cat")) === Set(3L))
    assert(search(Seq("the"), Seq("the")) === Set.empty)
  }

  test("boolean search: repeated doc-internal term still one id; " +
      "absent must term -> empty; absent mustNot term is a no-op") {
    assert(search(Seq("cat"), Seq.empty) === Set(1L, 2L))
    assert(search(Seq("unicorn", "the"), Seq.empty) === Set.empty)
    assert(search(Seq("cat"), Seq("unicorn")) === Set(1L, 2L))
  }
}
