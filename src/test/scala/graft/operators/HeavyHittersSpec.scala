package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  // Zipf-ish occurrences: value v with frequency ~ 1/v
  private def occurrences(n: Int, seed: Long): Seq[String] =
    samples(Gen.frequency(
      10 -> Gen.const("the"), 6 -> Gen.const("of"),
      4 -> Gen.const("and"), 2 -> Gen.choose(0, 30).map("mid" + _),
      1 -> Gen.choose(0, 500).map("tail" + _)), n, seed)

  test("MG bracket law: est <= true <= est + slack for kept values; " +
      "true <= slack for dropped values") {
    val occ = occurrences(4000, 1500L)
    val df = occ.zipWithIndex.map { case (v, i) =>
      ("g", v, i.toLong % 7) }.toDF("g", "v", "sh")
    val (sum0, slack0) = HeavyHitters.shardSummaries(df, $"g", $"v",
      $"sh", m = 12)
    val est = sum0.select($"value", $"est").as[(String, Long)]
      .collect().toMap
    val slack = slack0.select($"slack").as[Long].head()
    val truth = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    est.foreach { case (v, e) =>
      assert(e <= truth(v), s"$v overestimated: $e > ${truth(v)}")
      assert(truth(v) <= e + slack, s"$v out of bracket")
    }
    (truth.keySet diff est.keySet).foreach { v =>
      assert(truth(v) <= slack, s"dropped $v exceeds slack")
    }
    // the heavy head is always kept
    assert(est.contains("the") && est.contains("of"))
  }

  test("m >= distinct values degenerates to the exact census " +
      "(threshold 0, zero slack)") {
    val df = Seq(("g", "a", 0L), ("g", "a", 1L), ("g", "b", 0L))
      .toDF("g", "v", "sh")
    val (s, sl) = HeavyHitters.shardSummaries(df, $"g", $"v", $"sh",
      m = 10)
    assert(s.select($"value", $"est").as[(String, Long)].collect()
      .toMap === Map("a" -> 2L, "b" -> 1L))
    assert(sl.select($"slack").as[Long].head() === 0L)
  }

  test("merged batch summaries keep the bracket with summed slack " +
      "and are merge-order independent") {
    val occ = occurrences(3000, 8200L)
    val (h1, h2) = occ.zipWithIndex.partition(_._2 % 2 == 0)
    def mk(xs: Seq[(String, Int)]) = xs.map { case (v, i) =>
      ("g", v, i.toLong % 5) }.toDF("g", "v", "sh")
    val (s1, l1) = HeavyHitters.shardSummaries(mk(h1), $"g", $"v",
      $"sh", m = 10)
    val (s2, l2) = HeavyHitters.shardSummaries(mk(h2), $"g", $"v",
      $"sh", m = 10)
    val (ms, ml) = HeavyHitters.merge(Seq(s1, s2), Seq(l1, l2))
    val (ms2, _) = HeavyHitters.merge(Seq(s2, s1), Seq(l2, l1))
    assert(ms.as[(String, String, Long)].collect().toSet ===
      ms2.as[(String, String, Long)].collect().toSet)
    val est = ms.select($"value", $"est").as[(String, Long)]
      .collect().toMap
    val slack = ml.select($"slack").as[Long].head()
    val truth = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    est.foreach { case (v, e) =>
      assert(e <= truth(v) && truth(v) <= e + slack, s"$v bracket")
    }
  }
}
