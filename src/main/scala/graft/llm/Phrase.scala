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
}
