package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log template mining (the Drain-family recipe re-derived in
  * DataFrame terms): cluster log lines by their FIXED structure and
  * replace the variable positions with a wildcard — "conn from
  * 10.0.0.7 took 42 ms" and "conn from 10.9.1.2 took 7 ms" collapse
  * to "conn from <*> took <*> ms". The inventory a 100 TB log lake
  * needs before anything else: which templates exist, how often, so
  * parsing/alerting/sampling work per-template instead of per-line.
  *
  * Clustering key is (token count, first token) — the Drain
  * heuristic's first two levels; a position is variable within a
  * cluster iff more than one distinct token appears there.
  *
  * Shape: lines tokenize row-locally; ONE exchange on
  * (cluster, position) for the distinct-token census (map-side
  * combinable), one on the cluster for reassembly — line text is
  * never self-joined, and per-partition state is bounded by cluster
  * vocabulary, not line count. Deterministic: the surviving token of
  * a fixed position is min(token) (all equal anyway), positions
  * reassemble by explicit sort, ties in support break by template
  * string.
  */
object LogTemplate {

  /** (template, n_lines) per cluster with at least `minSupport`
    * lines; `n_wild` counts wildcard positions. */
  def mine(df: DataFrame, line: Column,
           minSupport: Long = 2L): DataFrame = {
    val toks = df
      .select(filter(split(trim(line), "[ \t\n\f\r]+"),
        t => length(t) > 0).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("toks"), size(col("toks")).as("nt"),
        col("toks").getItem(0).as("t0"))
    val pos = toks.select(col("nt"), col("t0"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
    // per (cluster, position): support and whether the position is
    // fixed; count(*) counts line-occurrences, so every position of a
    // cluster carries the same support = cluster line count
    val census = pos.groupBy(col("nt"), col("t0"), col("pos"))
      .agg(count(lit(1)).as("n_lines"),
        (count_distinct(col("tok")) === 1).as("fixed"),
        min(col("tok")).as("tok"))
    census
      .withColumn("piece",
        when(col("fixed"), col("tok")).otherwise(lit("<*>")))
      .groupBy(col("nt"), col("t0"))
      .agg(max(col("n_lines")).as("n_lines"),
        sum(when(col("fixed"), 0L).otherwise(1L)).as("n_wild"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("piece")))),
          p => p.getField("piece")), " ").as("template"))
      .filter(col("n_lines") >= minSupport)
      .select(col("template"), col("n_lines"), col("n_wild"))
      .orderBy(col("n_lines").desc, col("template"))
  }
}
