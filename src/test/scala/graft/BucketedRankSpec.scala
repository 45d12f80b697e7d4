package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for QueryShared.bucketedRank — the shared global-rank-
  * without-a-global-window decomposition (q352/q359/q360 pattern,
  * used by q363–q367). Reference is the single-task global window
  * the helper exists to avoid; small frames only. */
class BucketedRankSpec extends SparkSpec {
  import spark.implicits._

  test("value-bucket global rank ≡ row_number over (v, id) on a " +
      "SKEWED value census (one value holds half the rows)") {
    // 50% of rows share v=7 — the per-bucket window must still rank
    // inside the hot bucket, and offsets must skip it exactly
    val df = spark.range(1000L).select(
      $"id".as("doc_id"),
      when(pmod($"id", lit(2L)) === 0, lit(7L))
        .otherwise(pmod($"id" * 13L, lit(97L))).as("v"))
    val got = QueryShared.bucketedRank(df, Seq.empty, "v",
        Seq("v", "doc_id"), "rk")
      .select($"doc_id", $"rk")
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy($"v", $"doc_id")).cast("long"))
      .select($"doc_id", $"rk")
    assert(got.orderBy($"doc_id").as[(Long, Long)].collect().toSeq ===
      want.orderBy($"doc_id").as[(Long, Long)].collect().toSeq)
  }

  test("per-group md5-prefix rank ≡ row_number over (h, id) within " +
      "each group, groups never bleed into each other's offsets") {
    val df = spark.range(600L).select(
        $"id".as("doc_id"),
        pmod($"id", lit(3L)).cast("string").as("g"))
      .withColumn("h", md5(concat(lit("t:"), $"g", lit(":"),
        $"doc_id".cast("string")).cast("binary")))
      .withColumn("__bk", substring($"h", 1, 2))
    val got = QueryShared.bucketedRank(df, Seq("g"), "__bk",
        Seq("h", "doc_id"), "rk")
      .select($"g", $"doc_id", $"rk")
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"h", $"doc_id")).cast("long"))
      .select($"g", $"doc_id", $"rk")
    assert(got.orderBy($"g", $"doc_id")
      .as[(String, Long, Long)].collect().toSeq ===
      want.orderBy($"g", $"doc_id")
        .as[(String, Long, Long)].collect().toSeq)
  }
}
