package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("contentFingerprint: invariant under row order and " +
      "partitioning; any single-cell change moves it") {
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i, s"v$i"))
    val a = rows.toDF("g", "k", "v")
    val b = scala.util.Random.shuffle(rows).toDF("g", "k", "v")
      .repartition(7)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Fingerprint.contentFingerprint(df, $"g", Seq($"k", $"v"))
        .as[(String, Long, Long)].collect().toSet
    assert(fp(a) === fp(b), "order/partitioning must not matter")
    // flip one cell in one group: exactly that group's fp moves
    val mutated = rows.map { case (g, k, v) =>
      if (k == 250L) (g, k, "CHANGED") else (g, k, v)
    }.toDF("g", "k", "v")
    val diff = fp(a).map(r => r._1 -> r._3).toMap
      .toSet diff fp(mutated).map(r => r._1 -> r._3).toMap.toSet
    assert(diff.map(_._1) === Set(s"g${250L % 3}"),
      "only the touched group's fingerprint changes")
  }
}
