package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event stream: assign a session ordinal per
  * (entity, gap-bounded burst of events). The reference has no event-time
  * sessions (SURVEY.md §2l — its streaming is at-least-once micro-batch);
  * this is part of the events/streaming extension. The same semantics run
  * incrementally via `session_window` in graft.streaming.
  *
  * Plan shape: one shuffle on the entity key, then two window passes over
  * the sorted partition — no state on the driver; partitions by entity so
  * it scales with the number of users, not events.
  */
object Sessionize {

  /** Adds `session_id` (0-based per entity) to each event row. A new
    * session starts when the gap to the previous event exceeds `gapSec`.
    * Gap math is in integer microseconds (`unix_micros`), not truncated
    * seconds, so sub-second timestamps classify exactly.
    *
    * The event-time column is normalized to `TimestampType` first
    * (`unix_micros` rejects TIMESTAMP_NTZ, which NTZ-flavored parquet
    * writers deliver; UTC session tz makes the cast value-preserving —
    * see EventStream.normalizeEventTime). */
  def withSessionIds(events: DataFrame, entity: Column, ts: Column,
                     gapSec: Long): DataFrame = {
    val tsN = ts.cast("timestamp")
    val w = Window.partitionBy(entity).orderBy(tsN)
    val gap = unix_micros(tsN) - unix_micros(lag(tsN, 1).over(w))
    val isNew = when(gap.isNull || gap > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }
}
