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

  test("rowHash rendering is injective: NULL position and separator " +
      "characters cannot collide") {
    // the two classic '|'-join collision families
    def h(a: Option[String], b: Option[String]): Long =
      Seq((a.orNull, b.orNull)).toDF("a", "b")
        .select(Fingerprint.rowHash(Seq($"a", $"b")).as("h"))
        .as[Long].head()
    assert(h(None, Some("x")) !== h(Some("x"), None),
      "(NULL,'x') vs ('x',NULL) must differ")
    assert(h(Some("a|b"), Some("c")) !== h(Some("a"), Some("b|c")),
      "separator chars in values must not shift cell boundaries")
    assert(h(Some("12"), Some("3")) !== h(Some("1"), Some("23")),
      "digit spill across cells must not collide")
    assert(h(None, None) !== h(Some(""), Some("")),
      "NULL vs empty string must differ")
  }

  test("contentFingerprint distinguishes snapshots that differ only " +
      "by a NULL cell") {
    val a = Seq(("g", Some("x"), Option.empty[String]))
      .toDF("g", "k", "v")
    val b = Seq(("g", Option.empty[String], Some("x")))
      .toDF("g", "k", "v")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Fingerprint.contentFingerprint(df, $"g", Seq($"k", $"v"))
        .select($"fp").as[Long].head()
    assert(fp(a) !== fp(b))
  }
}
