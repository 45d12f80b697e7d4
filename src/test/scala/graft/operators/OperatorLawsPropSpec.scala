package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized laws for the round-7 analytics operators: each property
  * checks the DISTRIBUTED implementation against an independent
  * sequential replay in plain Scala over generated data — the same
  * discipline as PipelineLawsPropSpec (fixed seeds: reproducible,
  * no flaky CI). */
class OperatorLawsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("cusum law: windowed closed form == sequential max(0, s+d) " +
      "replay on random integer series") {
    val series = samples(
      Gen.choose(2, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-50L, 120L))), 25, seed = 9100L)
    val rows = series.zipWithIndex.flatMap { case (xs, k) =>
      xs.zipWithIndex.map { case (x, i) => (s"k$k", i, x) }
    }.toDF("k", "o", "x")
    val out = ChangeDetect.cusum(rows, $"k", $"o", $"x")
      .as[(String, Int, Long)].collect()
      .map { case (k, o, s) => (k, o) -> s }.toMap
    series.zipWithIndex.foreach { case (xs, k) =>
      val n = xs.length.toLong
      val tot = xs.sum
      var s = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        s = math.max(0L, s + (n * x - tot))
        assert(out((s"k$k", i)) === s, s"series $k at $i")
      }
    }
  }

  test("bitmap law: overlap counts == exact distinct intersections " +
      "on random membership relations") {
    val rel = samples(Gen.zip(Gen.oneOf("a", "b", "c", "d"),
      Gen.choose(0L, 400L)), 600, seed = 9200L)
    val df = rel.toDF("s", "m")
    val out = Bitmap.overlap(Bitmap.bitmapWords(df, $"s", $"m"))
      .as[(String, String, Long, Long, Long)].collect()
    val sets = rel.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (sa, sb, na, nb, nc) =>
      assert(na === sets(sa).size.toLong)
      assert(nb === sets(sb).size.toLong)
      assert(nc === (sets(sa) intersect sets(sb)).size.toLong)
    }
    // every pair with a shared word appears; pairs can only be
    // missing when NO word is shared, which implies empty intersection
    val present = out.map(r => (r._1, r._2)).toSet
    for (a <- sets.keys; b <- sets.keys if a < b)
      if (!present((a, b)))
        assert((sets(a) intersect sets(b)).isEmpty)
  }

  test("shuffle-shards law: bucket-decomposed rank is a bijection " +
      "onto 1..N matching the sequential (md5, id) sort") {
    val ids = samples(Gen.choose(0L, 1000000L), 400, seed = 9300L)
      .distinct
    val out = graft.llm.Sharding.globalShuffleShards(ids.toDF("id"),
        $"id", "law", 37L)
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._3).sorted.toSeq === (1L to ids.length).toSeq)
    val expect = out.map { case (id, h, _, _) => (h, id) }.sorted
      .zipWithIndex.map { case ((_, id), ix) => id -> (ix + 1L) }.toMap
    out.foreach { case (id, _, rn, shard) =>
      assert(rn === expect(id))
      assert(shard === (rn - 1) / 37)
    }
  }

  test("hierarchy law: subtree sums equal brute-force descendant " +
      "scan under the div-chain ancestor relation") {
    val nodes = samples(Gen.zip(Gen.choose(1L, 99999L),
      Gen.choose(1L, 50L)), 150, seed = 9400L)
      .distinctBy(_._1)
    val out = Hierarchy.subtreeRollup(nodes.toDF("k", "v"), $"k",
        $"v", base = 10, depth = 5)
      .as[(Long, Long, Long)].collect()
      .map { case (n, c, s) => n -> ((c, s)) }.toMap
    def ancestors(k: Long): Seq[Long] =
      Iterator.iterate(k)(_ / 10).takeWhile(_ >= 1).toSeq
    val keys = nodes.map(_._1).toSet
    // brute force: for every existing node, sum every node that has
    // it among its ancestors
    keys.foreach { a =>
      val desc = nodes.filter { case (k, _) => ancestors(k).contains(a) }
      assert(out(a) === ((desc.length.toLong, desc.map(_._2).sum)),
        s"node $a")
    }
    assert(out.keySet === keys.filter(a =>
      nodes.exists { case (k, _) => ancestors(k).contains(a) }))
  }

  test("weighted-quantile law: integer-threshold selection == the " +
      "plain quantile of the weight-expanded multiset") {
    val groups = samples(
      Gen.choose(3, 30).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(-500L, 500L), Gen.choose(1L, 9L)))),
      20, seed = 9500L)
    val rows = groups.zipWithIndex.flatMap { case (vw, g) =>
      vw.map { case (v, w) => (s"g$g", v, w) }
    }.toDF("k", "v", "w")
    val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
      ("p90", 9, 10), ("p100", 1, 1))
    val out = ExactQuantile.weightedQuantileDisc(rows, $"k", $"v",
        $"w", qs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    groups.zipWithIndex.foreach { case (vw, g) =>
      // expand each value w times; quantile num/den of the sorted
      // multiset is element at rank ceil(num*N/den)
      val expanded = vw.flatMap { case (v, w) =>
        Seq.fill(w.toInt)(v) }.sorted
      val n = expanded.length.toLong
      val got = out(s"g$g")
      assert(got._2 === n, s"total_w g$g")
      val expect = qs.map { case (_, num, den) =>
        expanded(((num.toLong * n + den - 1) / den - 1).toInt)
      }
      assert(Seq(got._3, got._4, got._5, got._6, got._7) === expect,
        s"quantiles g$g")
    }
  }

  test("weighted-quantile law: zero-weight rows are invisible (their " +
      "values never selected; all-zero groups absent)") {
    // weights drawn from 0..9, so ~10% of rows are zero-weight; the
    // weight-expanded multiset drops them naturally (fill(0) = empty),
    // and the engine must agree — a zero-weight value returned as a
    // quantile is exactly the corruption the w>0 guard prevents
    val groups = samples(
      Gen.choose(3, 30).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(-500L, 500L), Gen.choose(0L, 9L)))),
      20, seed = 9600L)
    val rows = groups.zipWithIndex.flatMap { case (vw, g) =>
      vw.map { case (v, w) => (s"g$g", v, w) }
    } :+ (("gz", 123L, 0L)) // an ALL-zero group: must vanish entirely
    val df = rows.toDF("k", "v", "w")
    val qs = Seq(("p50", 1, 2), ("p100", 1, 1))
    val out = ExactQuantile.weightedQuantileDisc(df, $"k", $"v",
        $"w", qs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out.contains("gz"), "all-zero-weight group must be absent")
    groups.zipWithIndex.foreach { case (vw, g) =>
      val expanded = vw.flatMap { case (v, w) =>
        Seq.fill(w.toInt)(v) }.sorted
      if (expanded.isEmpty) assert(!out.contains(s"g$g"))
      else {
        val n = expanded.length.toLong
        val got = out(s"g$g")
        assert(got._2 === n, s"total_w g$g")
        val expect = qs.map { case (_, num, den) =>
          expanded(((num.toLong * n + den - 1) / den - 1).toInt)
        }
        assert(Seq(got._3, got._4) === expect, s"quantiles g$g")
      }
    }
  }

  test("range-partition law: cuts derived from the rank-spaced " +
      "summary balance partitions within 2*shards*(k-1) + maxTie + " +
      "(P-1) on random tied multisets (the q329 certificate)") {
    val shards = 4; val kk = 8; val pParts = 8
    val series = samples(Gen.choose(200, 700).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 300L))), 8, seed = 9900L)
    series.zipWithIndex.foreach { case (xs, si) =>
      val rows = xs.zipWithIndex
        .map { case (v, i) => ("g", v, i.toLong) }
        .toDF("g0", "vv", "t")
      val summ = QuantileSummary.shardSummary(rows, $"g0", $"vv",
        $"t", shards, kk)
      val srows = summ.groupBy($"value").agg(sum($"w").as("w"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val n = xs.length.toLong
      // boundary i = smallest summary value whose cumulative weight
      // reaches max(1, (i*n) div P) — exactly q329's integer rule
      val targets = (1 until pParts).map(i => math.max(1L, i * n / pParts))
      val cuts = targets.map { t =>
        var cw = 0L
        srows.collectFirst {
          case (v, w) if { cw += w; cw >= t } => v
        }.getOrElse(srows.last._1)
      }
      val maxTie = xs.groupBy(identity).values.map(_.size).max.toLong
      val bound = 2L * shards * (kk - 1) + maxTie + (pParts - 1)
      val counts = new Array[Long](pParts)
      xs.foreach { v => counts(cuts.count(_ < v)) += 1L }
      counts.zipWithIndex.foreach { case (c, i) =>
        assert(math.abs(c - n / pParts) <= bound,
          s"series $si partition $i: $c vs ${n / pParts}, bound $bound")
      }
    }
  }
}
