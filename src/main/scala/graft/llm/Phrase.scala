package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase querying — the postings-
  * intersection recipe every search engine uses (public IR textbook
  * material, e.g. Manning et al. IIR ch.2): index (id, pos, tok)
  * once; a phrase query joins the phrase's tokens at aligned offsets
  * and never touches the corpus text again.
  *
  * Scale shape: the index build is one posexplode (row-local); each
  * phrase probe is |phrase|−1 equi-joins on (id, aligned-start),
  * anchored at the phrase's RAREST token so the candidate set starts
  * at min-df and only shrinks — the selectivity ordering that keeps a
  * stopword-heavy phrase ("in the") from exploding the first join.
  * The df lookup for the ordering reads |phrase| rows (loop-constant
  * discipline). */
object Phrase {

  /** Positional postings: one row per (doc, position, token). */
  def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"),
      posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "tok")))

  /** (id, n_occ) for docs containing the exact consecutive phrase,
    * with the number of distinct start positions. */
  def phraseOccurrences(postings: DataFrame, phrase: Seq[String])
      : DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val dfs = postings.filter(col("tok").isin(phrase.distinct: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // any phrase token absent from the corpus -> no matches at all
    if (phrase.exists(t => !dfs.contains(t)))
      return postings.sparkSession.range(0)
        .select(col("id"), col("id").as("n_occ"))
    val order = phrase.indices.sortBy(i => (dfs(phrase(i)), i))
    val anchor = order.head
    val start = postings.filter(col("tok") === phrase(anchor))
      .select(col("id"), (col("pos") - anchor).as("start"))
    val joined = order.drop(1).foldLeft(start) { (acc, i) =>
      acc.join(postings.filter(col("tok") === phrase(i))
        .select(col("id"), (col("pos") - i).as("start")),
        Seq("id", "start"))
    }
    joined.filter(col("start") >= 0)
      .groupBy(col("id")).agg(count(lit(1)).as("n_occ"))
  }

  /** Boolean retrieval over the same positional index: ids whose doc
    * contains EVERY `must` term and NONE of the `mustNot` terms
    * (IIR ch.1 postings intersection). Must-terms intersect as
    * semi-joins ordered rarest-first — the candidate set starts at
    * the min-df term's postings and only shrinks — and mustNot terms
    * subtract as anti-joins LAST, when the candidate set is already
    * minimal. Each term's postings are deduped to (id) before
    * joining, so a term repeated within a doc costs one row, and the
    * df lookup for the ordering reads |must| rows (loop-constant
    * discipline, same as [[phraseOccurrences]]). */
  def booleanSearch(postings: DataFrame, must: Seq[String],
                    mustNot: Seq[String] = Seq.empty): DataFrame = {
    require(must.nonEmpty, "boolean search needs at least one must term")
    def docsWith(t: String) =
      postings.filter(col("tok") === t).select(col("id")).distinct()
    val dfs = postings.filter(col("tok").isin(must.distinct: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (must.exists(t => !dfs.contains(t)))
      return postings.sparkSession.range(0).select(col("id"))
    val ordered = must.distinct.sortBy(t => (dfs(t), t))
    val base = ordered.tail.foldLeft(docsWith(ordered.head)) { (acc, t) =>
      acc.join(docsWith(t), Seq("id"), "left_semi")
    }
    mustNot.distinct.foldLeft(base) { (acc, t) =>
      acc.join(docsWith(t), Seq("id"), "left_anti")
    }
  }
}
