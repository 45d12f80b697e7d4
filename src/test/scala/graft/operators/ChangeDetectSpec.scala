package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeDetectSpec extends SparkSpec {
  import spark.implicits._

  test("cusum closed form == direct max(0, s+d) recursion, per key") {
    // two keys with different means; one sustained upward shift in A
    val rows = Seq(
      ("A", 1, 10L), ("A", 2, 10L), ("A", 3, 30L), ("A", 4, 30L),
      ("A", 5, 30L),
      ("B", 1, 5L), ("B", 2, 7L), ("B", 3, 3L))
      .toDF("k", "o", "x")
    val out = ChangeDetect.cusum(rows, $"k", $"o", $"x")
      .as[(String, Int, Long)].collect()
      .map { case (k, o, s) => (k, o) -> s }.toMap
    // replay the recursion in Scala: d = n*x - total per key
    for ((k, xs) <- Seq("A" -> Seq(10L, 10L, 30L, 30L, 30L),
        "B" -> Seq(5L, 7L, 3L))) {
      val n = xs.length.toLong
      val tot = xs.sum
      var s = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        s = math.max(0L, s + (n * x - tot))
        assert(out((k, i + 1)) === s, s"key=$k ord=${i + 1}")
      }
    }
    // the shift series accumulates; the stable series stays near 0
    assert(out(("A", 5)) > 0L)
  }

  test("cusum resets to zero after the drift reverses") {
    // mean 0; big positive then equal negative -> statistic returns to 0
    val rows = Seq(("K", 1, 4L), ("K", 2, -4L), ("K", 3, 0L))
      .toDF("k", "o", "x")
    val out = ChangeDetect.cusum(rows, $"k", $"o", $"x")
      .as[(String, Int, Long)].collect()
      .map { case (_, o, s) => o -> s }.toMap
    assert(out(1) === 12L) // d = 3*4 - 0
    assert(out(2) === 0L)  // 12 - 12, floored at 0
    assert(out(3) === 0L)
  }
}
