package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("subtreeRollup: div-10 forest, subtree sums include self and " +
      "all descendants; gaps roll to real nodes only") {
    // tree (div 10): 1 <- 10..19 (only 12, 15 present), 12 <- 120..129
    val rows = Seq((1L, 100L), (12L, 10L), (15L, 20L), (123L, 1L),
      (129L, 2L)).toDF("k", "v")
    val out = Hierarchy.subtreeRollup(rows, $"k", $"v", base = 10,
        depth = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, c, s) => n -> ((c, s)) }.toMap
    assert(out(1L) === ((5L, 133L)))  // whole forest under 1
    assert(out(12L) === ((3L, 13L)))  // 12 + 123 + 129
    assert(out(15L) === ((1L, 20L)))
    assert(out(123L) === ((1L, 1L)))
    // ancestor 2..9 don't exist -> no rows for them
    assert(!out.contains(2L))
  }

  test("existingOnly=false rolls into arithmetic ancestors too") {
    val rows = Seq((123L, 7L)).toDF("k", "v")
    val out = Hierarchy.subtreeRollup(rows, $"k", $"v", 10, 3,
        existingOnly = false)
      .as[(Long, Long, Long)].collect()
      .map { case (n, c, s) => n -> ((c, s)) }.toMap
    assert(out === Map(123L -> ((1L, 7L)), 12L -> ((1L, 7L)),
      1L -> ((1L, 7L))))
  }
}
