package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class QuantileSummarySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private val qs = Seq(0.1, 0.5, 0.9, 0.99)

  /** Exact integer-threshold quantile on the raw multiset. */
  private def exactQ(vals: Seq[Long], q: Double): Long = {
    val sorted = vals.sorted
    val tgt = math.max(1L, math.ceil(q * sorted.size - 1e-9).toLong)
    sorted((tgt - 1).toInt)
  }

  test("k = 1 law: the summary is the exact multiset, so quantile " +
      "answers equal direct integer-threshold selection") {
    val vals = samples(Gen.choose(-1000L, 1000L), 500, 7100L)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (if (i % 2 == 0) "a" else "b", v, i.toLong)
    }.toDF("g", "v", "id")
    val s = QuantileSummary.shardSummary(df, $"g", $"v", $"id",
      shards = 7, k = 1)
    val got = QuantileSummary.quantiles(s, qs)
      .select($"grp", $"q", $"value")
      .as[(String, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (g <- Seq("a", "b"); q <- qs) {
      val gv = vals.zipWithIndex
        .filter { case (_, i) => (if (i % 2 == 0) "a" else "b") == g }
        .map(_._1)
      assert(got((g, q)) === exactQ(gv, q), s"g=$g q=$q")
    }
  }

  test("rank-error bound: a k=16 summary over 11 shards answers " +
      "within shards*(k-1) ranks of the target, on skewed data") {
    val vals = samples(Gen.frequency(
      8 -> Gen.choose(0L, 100L),       // dense head
      2 -> Gen.choose(100000L, 900000L)), 3000, 9400L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "id")
    val shards = 11; val k = 16
    val s = QuantileSummary.shardSummary(df, $"g", $"v", $"id",
      shards, k)
    // the summary is actually small: sum of ceil(n_shard/k) rows
    assert(s.count() <= shards * (3000 / shards / k + 2))
    val got = QuantileSummary.quantiles(s, qs)
      .select($"q", $"value", $"n").as[(Double, Long, Long)].collect()
    val sorted = vals.sorted
    got.foreach { case (q, v, n) =>
      assert(n === 3000L)
      val tgt = math.max(1L, math.ceil(q * n - 1e-9).toLong)
      val le = sorted.count(_ <= v).toLong
      val lt = sorted.count(_ < v).toLong
      assert(lt < tgt, s"q=$q answer $v overshoots: $lt ranks below it")
      assert(le >= tgt - shards.toLong * (k - 1),
        s"q=$q answer $v undershoots: le=$le tgt=$tgt")
    }
  }

  test("merge is order-independent and the incremental path (merge " +
      "of per-batch summaries) honors the combined error bound") {
    val vals = samples(Gen.choose(0L, 10000L), 2000, 3300L)
    val (h1, h2) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    def mk(xs: Seq[(Long, Int)]) = xs.map { case (v, i) =>
      ("g", v, i.toLong) }.toDF("g", "v", "id")
    val shards = 5; val k = 8
    val s1 = QuantileSummary.shardSummary(mk(h1), $"g", $"v", $"id",
      shards, k)
    val s2 = QuantileSummary.shardSummary(mk(h2), $"g", $"v", $"id",
      shards, k)
    def ans(s: org.apache.spark.sql.DataFrame) =
      QuantileSummary.quantiles(s, qs)
        .select($"q", $"value").as[(Double, Long)].collect().toMap
    val ab = ans(QuantileSummary.merge(Seq(s1, s2)))
    val ba = ans(QuantileSummary.merge(Seq(s2, s1)))
    assert(ab === ba, "merge must be order-independent")
    // each half contributes <= `shards` shard summaries -> bound is
    // (2*shards)*(k-1) for the merged answer
    val sorted = vals.sorted
    ab.foreach { case (q, v) =>
      val tgt = math.max(1L, math.ceil(q * 2000 - 1e-9).toLong)
      assert(sorted.count(_ < v) < tgt)
      assert(sorted.count(_ <= v) >= tgt - 2L * shards * (k - 1))
    }
  }
}
