package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val log = Seq(
    // entity 1: A,A,B,A -> three runs (A 2 events, B, A again)
    (1L, t(10), "A"), (1L, t(20), "A"), (1L, t(30), "B"), (1L, t(40), "A"),
    // entity 2: single run
    (2L, t(15), "X"),
    // entity 3: B,B -> one run of two events
    (3L, t(5), "B"), (3L, t(50), "B")
  ).toDF("id", "ts", "state")

  private val dim = Scd.buildType2(log, $"id", $"ts", $"state")

  test("runs collapse consecutive equals only; A->B->A keeps 3 rows") {
    val e1 = dim.filter($"entity" === 1L)
      .orderBy($"valid_from")
      .select($"attr", $"valid_from", $"valid_to", $"n_events",
        $"is_current")
      .as[(String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(e1 === Seq(
      ("A", t(10), Some(t(30)), 2L, false),
      ("B", t(30), Some(t(40)), 1L, false),
      ("A", t(40), None, 1L, true)))
  }

  test("intervals tile: each entity has exactly one current row and " +
      "valid_to chains to the next valid_from") {
    val cur = dim.groupBy($"entity")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(cur.values.toSet === Set(1L))
    val e3 = dim.filter($"entity" === 3L).as[(Long, String, Timestamp,
      Option[Timestamp], Long, Boolean)].collect().toSeq
    assert(e3 === Seq((3L, "B", t(5), None, 2L, true)))
  }

  test("asOfEnrich picks the interval in force; pre-history and " +
      "unknown entities stay null") {
    val facts = Seq(
      (1L, t(10)), // exactly at A's start -> A
      (1L, t(29)), // inside first A run -> A
      (1L, t(30)), // boundary: [from, to) -> B
      (1L, t(99)), // current run -> A
      (2L, t(1)),  // before entity 2's history -> null
      (9L, t(50))  // unknown entity -> null
    ).toDF("id", "ft")
    val out = Scd.asOfEnrich(facts, $"id", $"ft", dim)
      .select($"id", $"ft", $"attr")
      .as[(Long, Timestamp, Option[String])].collect().toSet
    assert(out === Set(
      (1L, t(10), Some("A")), (1L, t(29), Some("A")),
      (1L, t(30), Some("B")), (1L, t(99), Some("A")),
      (2L, t(1), None), (9L, t(50), None)))
  }

  test("mergeType2: absorb, close, untouched, and new-entity paths") {
    val newLog = Seq(
      // entity 1 (current attr A): first new run A -> ABSORBED and
      // extended, then B closes it
      (1L, t(50), "A"), (1L, t(60), "B"),
      // entity 2 (current X): first new run Y -> current CLOSES at 60
      (2L, t(60), "Y"),
      // entity 9: brand new
      (9L, t(70), "Z")
      // entity 3: no new events -> untouched
    ).toDF("id", "ts", "state")
    val merged = Scd.mergeType2(dim, newLog, $"id", $"ts", $"state")
      .orderBy($"entity", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    val full = Scd.buildType2(
        log.unionByName(newLog), $"id", $"ts", $"state")
      .orderBy($"entity", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(merged === full)
    // spot checks of each path
    assert(merged.contains((1L, "A", t(40), Some(t(60)), 2L, false)))
    assert(merged.contains((1L, "B", t(60), None, 1L, true)))
    assert(merged.contains((2L, "X", t(15), Some(t(60)), 1L, false)))
    assert(merged.contains((9L, "Z", t(70), None, 1L, true)))
    assert(merged.contains((3L, "B", t(5), None, 2L, true)))
  }

  test("mergeType2 law: incremental merge == full rebuild on a " +
      "generated multi-entity log split at a cutoff") {
    val gen = for {
      e <- 1L to 20L
      i <- 0 to 14
    } yield (e, t(100 + i * 10 + e), // distinct per entity
      Seq("P", "Q", "R")(((i * 7 + e) % 3).toInt))
    val all = gen.toDF("id", "ts", "state")
    val cut = t(180)
    val dim0 = Scd.buildType2(all.filter($"ts" < cut),
      $"id", $"ts", $"state")
    val merged = Scd.mergeType2(dim0, all.filter($"ts" >= cut),
        $"id", $"ts", $"state")
      .orderBy($"entity", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    val full = Scd.buildType2(all, $"id", $"ts", $"state")
      .orderBy($"entity", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(merged === full)
  }

  test("plan: one entity exchange feeds both windows (no global window)") {
    val plan = dim.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition") ||
      !plan.toLowerCase.contains("window partitionby []"))
  }

  test("latestWins: highest version wins, winning delete removes the " +
      "key, delete beats an earlier upsert, untouched keys survive") {
    import spark.implicits._
    val snap = Seq((1L, "a", 0L, false), (2L, "b", 0L, false),
        (3L, "c", 0L, false))
      .toDF("k", "v", "ver", "del")
    val changes = Seq(
      (1L, "a2", 1L, false),           // plain upsert
      (2L, "b2", 1L, false),           // upsert...
      (2L, "b2", 2L, true),            // ...then a later delete wins
      (4L, "d", 1L, false))            // brand-new key
      .toDF("k", "v", "ver", "del")
    val out = Scd.latestWins(snap, changes, Seq("k"), "ver", "del")
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("latestWins determinism: tiebreak column orders equal versions") {
    import spark.implicits._
    val snap = Seq.empty[(Long, String, Long, Long, Boolean)]
      .toDF("k", "v", "ver", "seq", "del")
    val changes = Seq((1L, "x", 1L, 1L, false), (1L, "y", 1L, 2L, false))
      .toDF("k", "v", "ver", "seq", "del")
    val out = Scd.latestWins(snap, changes, Seq("k"), "ver", "del",
        tiebreak = Seq("seq"))
      .select($"v").as[String].collect().toSeq
    assert(out === Seq("y"), "the higher tiebreak must win")
  }
}
