package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.tables.Catalog

/** Queryable schema metadata — the reference's `meta.columns` virtual
  * table (public repo `vendor/jx_python/meta.py`, `jx_base/meta_columns.py`;
  * SURVEY.md §2 "dynamic schema"). Schema is discovered from the data
  * files (parquet footers via the catalog) and exposed AS a table, so
  * queries can introspect: `from: "meta.columns"`.
  *
  * `jx_type` is the JX type lattice (boolean|number|string|time|object|
  * nested), mapped from the Spark type; `nested_path` marks array-of-
  * struct levels (snowflake branches).
  */
object MetaColumns {

  def jxTypeOf(dt: DataType): String = dt match {
    case BooleanType                      => "boolean"
    case _: NumericType                   => "number"
    case StringType                       => "string"
    case TimestampType | TimestampNTZType | DateType => "time"
    case ArrayType(_: StructType, _)      => "nested"
    // JX: a multi-valued leaf keeps the leaf's type (typed-JSON ~N~ only
    // wraps objects); array<float> is a "number" column
    case ArrayType(e, _)                  => jxTypeOf(e)
    case _: StructType                    => "object"
    case BinaryType                       => "string"
    case _                                => "object"
  }

  /** One row per (table, leaf column): name, spark + jx type, nested
    * path, plus a `virtual` marker. Registered operator-output views
    * (Catalog.register) are introspected exactly like base tables —
    * `from: "meta.columns"` sees every queryable surface, not just
    * the files on disk. */
  def table(spark: SparkSession, catalog: Catalog): DataFrame = {
    def walk(dt: DataType, path: Seq[String], nestedPath: String)
        : Seq[(String, String, String, String)] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          walk(f.dataType, path :+ f.name, nestedPath))
      case ArrayType(inner: StructType, _) =>
        walk(inner, path, (if (nestedPath == ".") "" else nestedPath) +
          "." + path.mkString("."))
      case other =>
        Seq((path.mkString("."), other.simpleString, jxTypeOf(dt),
          nestedPath))
    }
    val surfaces =
      catalog.baseTables.map(t => (t, false)) ++
        catalog.registeredViews.map(v => (v, true))
    val rows = surfaces.flatMap { case (t, virt) =>
      walk(catalog.table(t).schema, Nil, ".").map {
        case (name, sparkType, jxType, nestedPath) =>
          (t, name, sparkType, jxType, nestedPath, virt)
      }
    }
    import spark.implicits._
    rows.toDF("table_name", "column_name", "spark_type", "jx_type",
      "nested_path", "virtual")
  }

  /** `meta.tables`: one row per queryable surface (base table or
    * registered view) with its column count. */
  def tables(spark: SparkSession, catalog: Catalog): DataFrame = {
    import spark.implicits._
    (catalog.baseTables.map(t => (t, false)) ++
        catalog.registeredViews.map(v => (v, true)))
      .map { case (t, virt) =>
        (t, catalog.table(t).schema.fields.length, virt) }
      .toDF("table_name", "n_columns", "virtual")
  }
}
