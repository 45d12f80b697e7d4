package graft.operators

import org.apache.spark.sql.DataFrame

/** Set operations (SURVEY.md §2h). The reference only concatenates
  * sources (`ConcatSources`, public repo `activedata_etl/etl.py` — J3);
  * JX documents are schema-flexible so concat must align by NAME and
  * tolerate missing columns. intersect/except are provided for oracle
  * completeness via Spark built-ins. */
object SetOps {

  /** J3: union-by-name with missing columns null-filled — the Spark
    * equivalent of concatenating heterogeneous JSON-lines blocks. */
  def concat(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
