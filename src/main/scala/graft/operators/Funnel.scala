package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log: how many entities
  * reach step 1, then step 2 STRICTLY AFTER their step-1 time, and so
  * on — the standard product-analytics conversion query, absent from
  * the reference's aggregate set (SURVEY.md §2d covers plain aggs) and
  * part of the events extension alongside [[Sessionize]].
  *
  * Shape per step: filter to one event type (pushable predicate),
  * equi-join on the entity against the previous step's (entity, t)
  * frame, one min() groupBy. Every stage is keyed by the entity, so
  * after the first shuffle the chain stays co-partitioned; the joined
  * side shrinks monotonically step over step (AQE broadcasts it once
  * it fits). No windows, no per-entity event collection — state per
  * entity is one timestamp per step.
  */
object Funnel {

  /** Per-entity step-reach times: (user, step_ix, step, t) — step_ix
    * 1-based, t = earliest qualifying event time. An entity appears
    * for a prefix of the steps (drop-off truncates the rows).
    *
    * `maxGap` (an SQL interval string, e.g. "1 hour") bounds each
    * step-to-step wait: a step counts only within `maxGap` of the
    * PREVIOUS step's reach time — the timed-funnel convention of
    * product analytics. Semantics stay GREEDY (each step takes its
    * earliest qualifying time); a later step-1 occurrence that would
    * have opened a within-gap path is not explored — the standard
    * trade, stated, and exactly what the oracle replays. */
  def reachTimes(events: DataFrame, entity: Column, ts: Column,
                 kind: Column, steps: Seq[String],
                 maxGap: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(entity.as("user"), ts.as("t"),
      kind.as("__kind"))
    var reached = ev.filter(col("__kind") === steps.head)
      .groupBy(col("user")).agg(min(col("t")).as("t"))
    val frames = scala.collection.mutable.ArrayBuffer(
      reached.select(col("user"), lit(1).as("step_ix"),
        lit(steps.head).as("step"), col("t")))
    val gapOk = (prev: Column, t: Column) => maxGap
      .map(g => t <= prev + expr(s"interval $g")).getOrElse(lit(true))
    for ((s, i) <- steps.tail.zipWithIndex) {
      reached = ev.filter(col("__kind") === s)
        .join(reached.select(col("user"), col("t").as("__prev")),
          Seq("user"))
        .filter(col("t") > col("__prev") &&
          gapOk(col("__prev"), col("t")))
        .groupBy(col("user")).agg(min(col("t")).as("t"))
      frames += reached.select(col("user"),
        lit(i + 2).as("step_ix"), lit(s).as("step"), col("t"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Funnel summary: per step, entities reached and the conversion
    * rate vs step 1 (an exact integer ratio — engine-portable). */
  def summary(events: DataFrame, entity: Column, ts: Column,
              kind: Column, steps: Seq[String],
              maxGap: Option[String] = None): DataFrame = {
    val counts = reachTimes(events, entity, ts, kind, steps, maxGap)
      .groupBy(col("step_ix"), col("step"))
      .agg(count(lit(1)).as("n_users"))
    val first = counts.filter(col("step_ix") === 1)
      .select(col("n_users").as("__n1"))
    counts.crossJoin(broadcast(first))
      .select(col("step_ix"), col("step"), col("n_users"),
        (col("n_users").cast("double") / col("__n1").cast("double"))
          .as("conv"))
  }
}
