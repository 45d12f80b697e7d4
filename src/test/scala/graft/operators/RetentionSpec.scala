package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: Monday cohorts, week offsets, exact ratios") {
    // 2024-01-01 is a Monday. Users 1,2 cohort in week 1; user 3 in
    // week 2. User 1 returns in week 2; user 2 does not.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), // wk0 (cohort week 01-01)
      (1L, ts("2024-01-09 10:00:00")), // wk1
      (2L, ts("2024-01-03 10:00:00")), // wk0 only
      (3L, ts("2024-01-10 10:00:00"))  // cohort week 01-08, wk0
    ).toDF("user_id", "t")
    val out = Retention.cohortRetention(ev, $"user_id", $"t",
        maxWeeks = 3)
      .orderBy($"cohort_week", $"wk")
      .select($"cohort_week".cast("string"), $"wk", $"n_active",
        $"cohort_size", $"retention")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0)))
  }

  test("cohortRetention: maxWeeks bounds the horizon; a same-user " +
      "event months later is excluded") {
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-06-01 10:00:00")) // ~21 weeks out
    ).toDF("user_id", "t")
    val out = Retention.cohortRetention(ev, $"user_id", $"t",
      maxWeeks = 3).collect()
    assert(out.length === 1 && out.head.getInt(1) === 0)
  }
}
