package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus curation: group-wise top-k selection (e.g. best-quality docs
  * per language) with BOUNDED aggregation state.
  *
  * Why not a window? `row_number() over (partition by group order by
  * score)` sorts ONE partition per group — at 100 TB with a dominant
  * group (English) that partition is the whole corpus and cannot be
  * split by AQE. Why not `slice(sort_array(collect_list(...)))`?
  * collect_list's accumulator is unbounded — every row of the group
  * shuffles. This Aggregator's accumulator is a k-capped ordered
  * buffer, so Catalyst applies partial aggregation: each map task
  * emits at most k candidates per group and the shuffle carries
  * O(groups × k × tasks-combined) rows, independent of group skew. */
object Curation {

  private type Entry = (Double, Long)

  /** Keep the k best (score desc, id asc on ties) — insertion into a
    * sorted, capped list. Buffers are tiny (k entries), merges linear. */
  private class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def better(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      val (hi, lo) = buf.span(better(_, e))
      (hi ++ (e +: lo)).take(k)
    }
    def zero: Seq[Entry] = Seq.empty
    def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] = insert(buf, e)
    def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)
    def finish(buf: Seq[Entry]): Seq[Entry] = buf
    def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }

  /** Top-k rows per group by `score` (desc; ties keep the smaller id).
    * Returns (group, rk, id, score) with rk in 1..k. */
  def topKPerGroup(df: DataFrame, group: Column, id: Column,
                   score: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.select(group.as("grp"), score.cast("double").as("s"),
        id.cast("long").as("i"))
      .groupBy(col("grp"))
      .agg(agg(col("s"), col("i")).as("top"))
      .select(col("grp"),
        posexplode(col("top")).as(Seq("__pos", "e")))
      .select(col("grp"), (col("__pos") + 1).cast("int").as("rk"),
        col("e._2").as("id"), col("e._1").as("score"))
  }
}
