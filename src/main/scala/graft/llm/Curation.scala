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

  /** N-gram NOVELTY per document: the fraction of a doc's distinct
    * word n-grams that appear in no other document (corpus df = 1) —
    * high novelty ≈ fresh prose, low novelty ≈ boilerplate/template
    * text (the inverse of the duplicated-spans signal, as a per-doc
    * scalar a curation policy can threshold on).
    *
    * `hashedShingles` (default): grams travel as the native 64-bit
    * shingle hashes, so the df census joins on longs (the
    * [[Contamination.sharedGrams]] trade — hash equality ≡ gram
    * equality up to ~1e-19/pair collisions). Counts and the ratio are
    * exact integers / one division.
    *
    * Scale: explode distinct grams, ONE map-side-combining census
    * groupBy, one equi-join back — the q104/q95 shape; no all-pairs
    * anything. */
  def noveltyScores(docs: DataFrame, id: Column, text: Column,
                    n: Int = 3, hashedShingles: Boolean = true)
      : DataFrame = {
    val grams =
      if (hashedShingles) TextAnalysis.shingleHashes(text, n)
      else TextAnalysis.shingles(text, n)
    val sh = docs.select(id.as("doc_id"), explode(grams).as("g"))
      .distinct()
    val census = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    sh.join(census, Seq("g"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L)))
          .as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        (col("n_unique").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
  }
}
