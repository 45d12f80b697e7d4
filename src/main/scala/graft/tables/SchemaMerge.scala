package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic-schema merge policy (SURVEY.md §2 "Dynamic schema" + §7 hard
  * parts): the reference discovers schema from data as the union of all
  * documents, with typed-JSON absorbing per-document type conflicts.
  * Spark-side policy for merging heterogeneous document frames:
  *
  *  - union of all column paths (missing -> null, JX missing semantics);
  *  - numeric conflicts widen within the numeric lattice
  *    (long < double);
  *  - boolean/numeric/string conflicts widen to string (the lossless
  *    common representation — the typed-JSON alternative keeps
  *    per-type columns, see [[graft.etl.TypedJson]]);
  *  - struct conflicts merge field-wise, recursively;
  *  - array conflicts merge element types.
  *
  * At 100 TB this runs over FOOTER schemas, not data — merging is
  * driver-side metadata work, then one pass casts each source frame to
  * the merged shape.
  */
object SchemaMerge {

  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x: StructType, y: StructType) => mergeStructs(x, y)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      ArrayType(widen(x, y), n1 || n2)
    case (x, y) if isIntegral(x) && isIntegral(y) =>
      if (x == LongType || y == LongType) LongType else IntegerType
    case (x: NumericType, y: NumericType)
        if isIntegral(x) != isIntegral(y) || (!isIntegral(x)) =>
      DoubleType
    case (TimestampType, TimestampNTZType) => TimestampType
    case (TimestampNTZType, TimestampType) => TimestampType
    case _ => StringType // boolean-vs-number, anything-vs-string, ...
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  def mergeStructs(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          StructField(fa.name, widen(fa.dataType, fb.dataType),
            nullable = true)
        case None => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    StructType(merged ++ b.fields.filterNot(f => aNames(f.name))
      .map(_.copy(nullable = true)))
  }

  def mergedSchema(schemas: Seq[StructType]): StructType =
    schemas.reduce(mergeStructs)

  /** Cast every frame to the merged schema (missing columns -> null) and
    * union them. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    val target = mergedSchema(dfs.map(_.schema))
    dfs.map { df =>
      val have = df.schema.fieldNames.toSet
      df.select(target.fields.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }.reduce(_.unionByName(_))
  }
}
