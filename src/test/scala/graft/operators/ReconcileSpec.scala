package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("columnDiffCensus: added/removed/matched + per-column changes " +
      "with null-safe compares") {
    val prev = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),       // null -> null: unchanged
      (3L, None, Some(30L)),       // null -> value: changed
      (4L, Some("d"), Some(40L)),  // removed
      (5L, Some("e"), Some(50L))   // both columns change
    ).toDF("k", "s", "n")
    val cur = Seq(
      (1L, Some("a"), Some(10L)),  // unchanged
      (2L, Some("b"), Option.empty[Long]),
      (3L, Some("x"), Some(30L)),
      (5L, Some("E"), Some(51L)),
      (6L, Some("f"), Some(60L))   // added
    ).toDF("k", "s", "n")
    val out = Reconcile.columnDiffCensus(prev, cur, "k", Seq("s", "n"))
      .as[(String, Long)].collect().toMap
    assert(out("added") === 1L)
    assert(out("removed") === 1L)
    assert(out("matched") === 4L)
    assert(out("changed_any") === 2L) // keys 3 and 5
    assert(out("changed:s") === 2L)   // 3 (null->x) and 5
    assert(out("changed:n") === 1L)   // 5 only; 2 is null<->null
    // census rows are exactly the declared metrics, no extras
    assert(out.keySet === Set("added", "removed", "matched",
      "changed_any", "changed:s", "changed:n"))
  }

  test("columnDiffCensus rejects an empty column list up front") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      Reconcile.columnDiffCensus(df, df, "k", Seq.empty)
    }
    assert(e.getMessage.contains("at least one column"))
  }
}
