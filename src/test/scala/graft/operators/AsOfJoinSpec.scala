package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join attaches the latest right row at or before left ts") {
    val quotes = Seq( // key, ts, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq( // key, ts
      ("A", 5L), ("A", 10L), ("A", 25L), ("A", 31L),
      ("B", 14L), ("B", 16L)
    ).toDF("sym", "tts")
    val out = Joins.asOf(trades, quotes, "sym",
        col("tts"), col("qts"), Seq("price"))
      .orderBy("sym", "tts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("A", 5L, null),   // no quote yet
      ("A", 10L, 1.0),   // equal ts counts (<=)
      ("A", 25L, 2.0),
      ("A", 31L, 3.0),
      ("B", 14L, null),
      ("B", 16L, 9.0)))
  }

  test("as-of join on events: last signup before each purchase") {
    val events = catalog.table("events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val out = Joins.asOf(purchases, signups, "user_id",
      col("ts"), col("ts"), Seq("event_id"))
    assert(out.count() === purchases.count()) // left rows preserved
    // every attached signup is a real signup event id
    val signupIds = signups.select("event_id").as[Long].collect().toSet
    val attached = out.filter(col("asof_event_id").isNotNull)
      .select("asof_event_id").as[Long].collect()
    assert(attached.forall(signupIds.contains))
  }
}
