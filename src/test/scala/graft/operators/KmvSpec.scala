package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch laws: exact under k, sane estimates over k, and shard
  * mergeability. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("fewer than k distinct keys -> the estimate IS the exact count") {
    val keys = (1 to 10).flatMap(i => Seq.fill(5)(s"k$i")).toDF("k")
    val est = Kmv.estimate(Kmv.sketch(keys, $"k", k = 64), k = 64)
      .as[Double].head()
    assert(est === 10.0)
  }

  test("estimate lands within a sane band of the truth at n >> k") {
    val n = 20000
    val keys = (1 to n).map(i => s"key_$i").toDF("k")
    val k = 256
    val est = Kmv.estimate(Kmv.sketch(keys, $"k", k), k)
      .as[Double].head()
    // expected rel err ~ 1/sqrt(k-2) ≈ 6%; the hash is fixed so this
    // is a deterministic value — band at 25% so a broken hash (est
    // off by orders of magnitude) fails while layout shifts don't
    assert(math.abs(est - n) <= n * 0.25,
      s"KMV estimate $est vs true $n")
  }

  test("MERGE law: k smallest of shard sketches == sketch of the " +
      "whole stream") {
    val a = (1 to 5000).map(i => s"key_$i").toDF("k")
    val b = (4000 to 9000).map(i => s"key_$i").toDF("k") // overlap
    val k = 128
    val whole = Kmv.sketch(a.unionAll(b), $"k", k)
      .as[Long].collect().sorted.toSeq
    val merged = Kmv.merge(
        Seq(Kmv.sketch(a, $"k", k), Kmv.sketch(b, $"k", k)), k)
      .as[Long].collect().sorted.toSeq
    assert(merged === whole)
  }

  test("setEstimates: EXACT in the under-k regime (the sketch IS the " +
      "set): union/jaccard/intersection all come out as truth") {
    val a = (1 to 60).map(i => s"key_$i").toDF("k")
    val b = (41 to 100).map(i => s"key_$i").toDF("k") // overlap = 20
    val k = 512 // > every set involved
    val out = Kmv.setEstimates(
        Kmv.sketch(a, $"k", k), Kmv.sketch(b, $"k", k), k)
      .as[(Double, Double, Double)].collect().head
    assert(out._1 === 100.0, s"union: $out")
    assert(out._2 === 0.2, s"jaccard 20/100: $out")
    assert(out._3 === 20.0, s"intersection: $out")
  }
}
