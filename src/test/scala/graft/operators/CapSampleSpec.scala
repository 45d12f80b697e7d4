package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Laws for CapSample — deterministic per-group capped sampling as
  * mergeable state (the q388/q389 contract). The fold law here is
  * what makes q389's "fold ≡ full rebuild" oracle hold on ANY split
  * of the corpus, not just the mod-3 one the query ships. */
class CapSampleSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val order = Seq("h", "id")

  /** 400 rows over 7 skewed groups (g0 holds ~half), md5-keyed. */
  private def corpus: DataFrame = spark.range(400L).select(
      $"id",
      when(pmod($"id", lit(2L)) === 0, lit("g0"))
        .otherwise(concat(lit("g"),
          pmod($"id" * 13L, lit(7L)).cast("string"))).as("g"))
    .withColumn("h", md5(concat(lit("cs:"),
      $"id".cast("string")).cast("binary")))

  private def canon(df: DataFrame): Seq[(String, Long)] =
    df.select($"g", $"id").as[(String, Long)]
      .collect().toSeq.sorted

  test("fold law: merge of per-batch mines ≡ mine of the union, " +
      "on an adversarial split (one batch holds a whole group)") {
    val c = corpus
    // batch A gets ALL of g1 plus half the rest; B gets the remainder
    val a = c.filter($"g" === "g1" ||
      (pmod($"id", lit(4L)) < 2 && $"g" =!= "g1"))
    val b = c.filter($"g" =!= "g1" && pmod($"id", lit(4L)) >= 2)
    val folded = CapSample.merge(
      CapSample.mine(a, "g", order, K),
      CapSample.mine(b, "g", order, K), "g", order, K)
    val rebuilt = CapSample.mine(c, "g", order, K)
    assert(canon(folded) === canon(rebuilt))
  }

  test("idempotence: merge(m, m) ≡ m") {
    val m = CapSample.mine(corpus, "g", order, K)
    assert(canon(CapSample.merge(m, m, "g", order, K)) === canon(m))
  }

  test("bound and under-k groups: never more than k rows per group; " +
      "a group with fewer than k rows keeps them all") {
    val c = corpus.filter($"g" =!= "g1")
      .unionByName(corpus.filter($"g" === "g1").limit(2))
    val m = CapSample.mine(c, "g", order, K)
    val sizes = m.groupBy($"g").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= K))
    assert(sizes("g1") === 2L)
  }

  test("determinism across arrival order: mine is invariant under " +
      "input permutation") {
    val m1 = CapSample.mine(corpus, "g", order, K)
    val m2 = CapSample.mine(corpus.orderBy($"h".desc), "g", order, K)
    assert(canon(m1) === canon(m2))
  }

  test("divergent payloads on one key fold deterministically: the " +
      "least payload wins regardless of merge order (r12 advice — " +
      "a re-crawled doc whose n_tok changed must not make the " +
      "standing manifest arbitrary)") {
    val m = CapSample.mine(corpus.withColumn("n_tok", $"id" * 10L),
      "g", order, K)
    // same keys, payload re-crawled to a different value
    val recrawled = m.withColumn("n_tok", $"n_tok" + 3L)
    val ab = CapSample.merge(m, recrawled, "g", order, K)
    val ba = CapSample.merge(recrawled, m, "g", order, K)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"id", $"n_tok").as[(String, Long, Long)]
        .collect().toSeq.sorted
    assert(toks(ab) === toks(ba))
    // deterministic pick = least payload, and exactly one row per key
    assert(toks(ab) === toks(m))
    assert(ab.groupBy($"g", $"id").count()
      .filter($"count" > 1).count() === 0L)
  }

  test("a null payload never displaces a real value (r13 advice: " +
      "a degraded redelivery with n_tok null must lose to the " +
      "original row, whichever order the batches fold)") {
    val m = CapSample.mine(corpus.withColumn("n_tok", $"id" * 10L),
      "g", order, K)
    val degraded = m.withColumn("n_tok",
      lit(null).cast("long"))
    val ab = CapSample.merge(m, degraded, "g", order, K)
    val ba = CapSample.merge(degraded, m, "g", order, K)
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"id", $"n_tok").as[(String, Long, Long)]
        .collect().toSeq.sorted
    assert(toks(ab) === toks(m))
    assert(toks(ba) === toks(m))
    assert(ab.filter($"n_tok".isNull).count() === 0L)
  }

  test("exact replays still fold to a no-op when a payload column " +
      "is present (at-least-once redelivery)") {
    val m = CapSample.mine(corpus.withColumn("n_tok", $"id" * 10L),
      "g", order, K)
    val folded = CapSample.merge(m, m, "g", order, K)
    assert(folded.count() === m.count())
  }

  test("mine rejects a non-string order head (the md5-hex bucket " +
      "contract, r12 advice)") {
    val numericHead = corpus.withColumn("h", $"id" * 7L)
    val e = intercept[IllegalArgumentException] {
      CapSample.mine(numericHead, "g", order, K)
    }
    assert(e.getMessage.contains("must be a string"))
  }
}
