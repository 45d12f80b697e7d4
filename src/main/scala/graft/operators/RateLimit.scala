package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-bucket rate-limiter REPLAY: given an event log, recompute
  * per entity which events a bucket of `capacity` tokens (refilling
  * `refillPerMin` per elapsed minute, `cost` per event) would have
  * accepted — the quota-enforcement audit an ingestion edge runs
  * offline: "what would this limit have done to last month's
  * traffic". All-integer state, so the replay is bit-replayable in
  * any engine.
  *
  * Shape: the fold is sequential per entity BY CONSTRUCTION, so it
  * runs as one ordered fold over each entity's collected event-minute
  * list — one exchange on the entity key, per-entity memory bounded
  * by that entity's event count (the same bound any per-entity
  * sessionization pays; an unbounded live stream would run the
  * identical transition in keyed state, cf. EventStream
  * .runningCountsTtl). The fold is `functions.aggregate` with an
  * explicit initial state; an engine seeding with the first ELEMENT
  * (DuckDB list_reduce) replays it by prepending a state-shaped
  * sentinel — same lambda, same arithmetic.
  *
  * Refill is integer minutes RELATIVE TO THE PREVIOUS EVENT
  * (gain = minute − last-minute, capped at capacity), the standard
  * lazy-refill formulation: no per-minute ticks, state is
  * (tokens, last) regardless of idle gaps.
  */
object RateLimit {

  /** Per-entity (n_events, n_accepted, n_rejected, tokens_left).
    * Events order by (`us`, `tie`) — pass a unique tiebreaker so the
    * fold order is total. */
  def tokenBucket(df: DataFrame, entity: Column, us: Column,
                  tie: Column, capacity: Long, refillPerMin: Long = 1L,
                  cost: Long = 1L): DataFrame = {
    val base = df.select(entity.as("entity"), us.cast("long").as("u"),
        tie.cast("long").as("i"))
      .withColumn("m", expr("u div 60000000"))
    val lists = base.groupBy(col("entity"))
      .agg(array_sort(collect_list(
        struct(col("u"), col("i"), col("m")))).as("xs"))
    val init = struct(lit(capacity).as("tokens"), lit(-1L).as("last"),
      lit(0L).as("acc"), lit(0L).as("rej"))
    def step(s: Column, e: Column): Column = {
      val m = e.getField("m")
      val gain = when(s.getField("last") < 0, lit(0L))
        .otherwise((m - s.getField("last")) * lit(refillPerMin))
      val t1 = least(lit(capacity), s.getField("tokens") + gain)
      val ok = t1 >= lit(cost)
      struct(
        (t1 - when(ok, lit(cost)).otherwise(lit(0L))).as("tokens"),
        m.as("last"),
        (s.getField("acc") + when(ok, 1L).otherwise(0L)).as("acc"),
        (s.getField("rej") + when(ok, 0L).otherwise(1L)).as("rej"))
    }
    lists.select(col("entity"),
        size(col("xs")).cast("long").as("n_events"),
        aggregate(col("xs"), init, step).as("__st"))
      .select(col("entity"), col("n_events"),
        col("__st.acc").as("n_accepted"),
        col("__st.rej").as("n_rejected"),
        col("__st.tokens").as("tokens_left"))
  }
}
