package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SweepSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("maxConcurrent: hand fixture — half-open intervals, " +
      "back-to-back end/start never double-counts") {
    val iv = Seq( // (grp, start, end)
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 10L, 20L), // [5,10) has 2
      ("b", 0L, 10L), ("b", 10L, 20L) // back-to-back: never 2 open
    ).toDF("g", "s", "e")
    val out = Sweep.maxConcurrent(iv, $"g", $"s", $"e")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 2L, 5L))) // 2 open first at t=5
    assert(out("b") === (("b", 1L, 0L)))
  }

  test("maxConcurrent law: equals brute-force coverage count at " +
      "every start point on random interval sets") {
    val sets = samples(
      Gen.choose(2, 30).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 100L), Gen.choose(1L, 40L)))),
      20, seed = 9700L)
    val rows = sets.zipWithIndex.flatMap { case (ivs, g) =>
      ivs.map { case (s, d) => (s"g$g", s, s + d) }
    }.toDF("g", "s", "e")
    val out = Sweep.maxConcurrent(rows, $"g", $"s", $"e")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    sets.zipWithIndex.foreach { case (ivs, g) =>
      val intervals = ivs.map { case (s, d) => (s, s + d) }
      // concurrency(t) = |{[s,e) : s <= t < e}|; the max is attained
      // at some start point, and the earliest argmax is a start too
      val byT = intervals.map(_._1).distinct.sorted.map { t =>
        (t, intervals.count { case (s, e) => s <= t && t < e })
      }
      val mx = byT.map(_._2).max
      val at = byT.filter(_._2 == mx).map(_._1).min
      assert(out(s"g$g") === ((s"g$g", mx.toLong, at)),
        s"group g$g intervals=$intervals")
    }
  }
}
