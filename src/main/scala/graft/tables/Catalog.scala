package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table resolver over a directory of parquet files — the Spark analog of
  * the reference's container/namespace (public repo `vendor/jx_base/
  * container.py`, `snowflake.py`; SURVEY.md §2 data model).
  *
  * Snowflake semantics: `table("task.artifacts")` — a dot-path whose prefix
  * is a base table and whose suffix digs into nested array-of-struct
  * columns — yields the EXPLODED nested level (one row per array element),
  * like JX `from: "task.artifacts"`. Parent scalar columns are retained
  * (prefixed) so nested queries can still reference ancestors.
  */
final class Catalog(spark: SparkSession, dir: String) {
  import org.apache.spark.sql.types._

  private val cache = scala.collection.mutable.Map[String, DataFrame]()

  def baseTables: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet")).sorted.toSeq
  }

  def table(name: String): DataFrame = cache.getOrElseUpdate(name, {
    val parts = name.split('.').toList
    // longest prefix that is a base table
    val baseNames = baseTables.toSet
    val (base, nested) = (1 to parts.length).reverse
      .map(i => (parts.take(i).mkString("."), parts.drop(i)))
      .find { case (b, _) => baseNames.contains(b) }
      .getOrElse(throw new IllegalArgumentException(
        s"unknown table: $name (have: ${baseTables.mkString(", ")})"))
    val df = spark.read.parquet(s"$dir/$base.parquet")
    nested.foldLeft(df)(explodeLevel)
  })

  /** Explode one nested array-of-struct level, keeping parent scalars. */
  private def explodeLevel(df: DataFrame, field: String): DataFrame = {
    val keep = df.schema.fields.filterNot(_.name == field)
      .map(f => col(f.name))
    val exploded = df.select((keep :+ explode(col(field)).as("__n"))
      .toIndexedSeq: _*)
    val childCols = exploded.schema.fields.last.dataType match {
      case s: StructType => s.fieldNames.map(n => col(s"__n.$n").as(n)).toSeq
      case _             => Seq(col("__n").as(field))
    }
    exploded.select((keep.toSeq ++ childCols).toIndexedSeq: _*)
  }
}
