package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: group entities by the ISO week
  * of their FIRST event (the cohort), then measure what fraction of
  * each cohort is still active 0, 1, 2… weeks later — the
  * companion report to [[Funnel]] in the events extension.
  *
  * Shape: one min() groupBy for first-event times, one entity-keyed
  * equi-join back (co-partitioned with the groupBy's shuffle), a
  * distinct on the narrow (entity, cohort, week) triple, and two tiny
  * per-cohort aggregations. Week offsets are integer day arithmetic
  * from the truncated cohort week start — exact and engine-portable
  * (both Spark and DuckDB truncate weeks to Monday).
  */
object Retention {

  /** Per (cohort_week, week_offset): active entities, cohort size and
    * the retention ratio (exact integer division). `maxWeeks` bounds
    * the report horizon; offset 0 is the (partial) cohort week. */
  def cohortRetention(events: DataFrame, entity: Column, ts: Column,
                      maxWeeks: Int): DataFrame = {
    val ev = events.select(entity.as("user"), ts.as("t"))
    val firsts = ev.groupBy(col("user")).agg(min(col("t")).as("t0"))
      .select(col("user"),
        to_date(date_trunc("week", col("t0"))).as("cohort_week"))
    val triples = ev.join(firsts, Seq("user"))
      .select(col("user"), col("cohort_week"),
        (datediff(to_date(col("t")), col("cohort_week")) / 7)
          .cast("int").as("wk"))
      .filter(col("wk") <= maxWeeks)
      .distinct()
    val active = triples.groupBy(col("cohort_week"), col("wk"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("wk"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") /
          col("cohort_size").cast("double")).as("retention"))
  }
}
