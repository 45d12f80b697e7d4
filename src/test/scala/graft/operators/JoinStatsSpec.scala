package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class JoinStatsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("estimate is EXACT when every bucket holds one distinct key " +
      "per side (histogram == full key census)") {
    val a = samples(Gen.choose(0L, 9L), 300, 100L).toDF("k")
    val b = samples(Gen.choose(0L, 9L), 200, 200L).toDF("k")
    val est = JoinStats.estimateEquiJoin(
        JoinStats.bucketHistogram(a, $"k", 64),
        JoinStats.bucketHistogram(b, $"k", 64))
      .as[Long].head()
    val actual = a.join(b, "k").count()
    assert(est === actual)
  }

  test("estimate matches the textbook per-bucket formula on " +
      "colliding buckets") {
    val a = samples(Gen.choose(0L, 999L), 2000, 300L)
    val b = samples(Gen.choose(0L, 999L), 1500, 400L)
    val buckets = 16
    def hist(xs: Seq[Long]) = xs.groupBy(_ % buckets).map {
      case (bk, vs) => bk -> (vs.size.toLong, vs.distinct.size.toLong)
    }
    val (ha, hb) = (hist(a), hist(b))
    val expected = ha.keySet.intersect(hb.keySet).toSeq.map { bk =>
      val (ra, ka) = ha(bk); val (rb, kb) = hb(bk)
      ra * rb / math.max(ka, kb)
    }.sum
    val est = JoinStats.estimateEquiJoin(
        JoinStats.bucketHistogram(a.toDF("k"), $"k", buckets),
        JoinStats.bucketHistogram(b.toDF("k"), $"k", buckets))
      .as[Long].head()
    assert(est === expected)
  }

  test("disjoint key spaces estimate 0; empty side estimates 0") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    // disjoint keys can still share buckets -> estimate may be > 0
    // (that's the histogram's resolution limit), but bucket-disjoint
    // key spaces estimate exactly 0
    val est0 = JoinStats.estimateEquiJoin(
        JoinStats.bucketHistogram(a, $"k", 64),
        JoinStats.bucketHistogram(Seq.empty[Long].toDF("k"), $"k", 64))
      .as[Long].head()
    assert(est0 === 0L)
    val estDisjBuckets = JoinStats.estimateEquiJoin(
        JoinStats.bucketHistogram(Seq(10L).toDF("k"), $"k", 64),
        JoinStats.bucketHistogram(Seq(11L).toDF("k"), $"k", 64))
      .as[Long].head()
    assert(estDisjBuckets === 0L)
  }
}
