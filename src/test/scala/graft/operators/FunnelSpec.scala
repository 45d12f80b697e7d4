package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val ev = Seq(
    // user 1 converts fully in order
    (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
    // user 2's click precedes the view -> stalls at step 1
    (2L, t(1), "click"), (2L, t(2), "view"), (2L, t(3), "purchase"),
    // user 3 stops after the click
    (3L, t(1), "view"), (3L, t(2), "click"),
    // user 4 never views
    (4L, t(1), "purchase"),
    // user 5: click at the SAME instant as the view -> strictly-after
    // semantics keep them at step 1
    (5L, t(1), "view"), (5L, t(1), "click")
  ).toDF("user_id", "ts", "kind")

  test("reachTimes: ordered, strictly-after, drop-off truncates") {
    val out = Funnel.reachTimes(ev, $"user_id", $"ts", $"kind",
        Seq("view", "click", "purchase"))
      .select($"user", $"step_ix").as[(Long, Int)].collect().toSet
    assert(out === Set(
      (1L, 1), (1L, 2), (1L, 3),
      (2L, 1), (3L, 1), (3L, 2), (5L, 1)))
  }

  test("summary: counts and exact conversion ratios vs step 1") {
    val out = Funnel.summary(ev, $"user_id", $"ts", $"kind",
        Seq("view", "click", "purchase"))
      .orderBy($"step_ix")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),
      (3, "purchase", 1L, 0.25)))
  }

  test("an out-of-log step type yields no rows from that step on") {
    val out = Funnel.summary(ev, $"user_id", $"ts", $"kind",
        Seq("view", "refund"))
      .orderBy($"step_ix").collect()
    assert(out.length === 1 && out.head.getString(1) === "view")
  }

  test("maxGap: a step past the bound no longer counts; within the " +
      "bound nothing changes") {
    // user 6: view at t=1, click at t=100 — outside a 10-second gap
    val ev6 = ev.unionByName(Seq((6L, t(1), "view"),
      (6L, t(100), "click")).toDF("user_id", "ts", "kind"))
    val bounded = Funnel.reachTimes(ev6, $"user_id", $"ts", $"kind",
        Seq("view", "click"), maxGap = Some("10 seconds"))
      .select($"user", $"step_ix").as[(Long, Int)].collect().toSet
    assert(!bounded.contains((6L, 2)), "slow click must not count")
    assert(bounded.contains((1L, 2)), "fast click still counts")
    val unbounded = Funnel.reachTimes(ev6, $"user_id", $"ts", $"kind",
        Seq("view", "click"))
      .select($"user", $"step_ix").as[(Long, Int)].collect().toSet
    assert(unbounded.contains((6L, 2)), "no gap -> the click counts")
  }
}
