package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed-JSON encoding (SURVEY.md §2j; public repo
  * `vendor/mo_json/typed_encoder.py`): the reference survives schema
  * conflicts by storing values under type-suffixed keys — `~b~` boolean,
  * `~n~` number, `~s~` string, `~e~` exists-count, `~N~` nested array —
  * so one logical column can hold several physical types.
  *
  * Spark's StructType is already typed, so natively this is only needed
  * at the EDGES: emitting documents a typed-JSON consumer (the
  * reference's ES indexes) can read, and folding typed-JSON documents
  * back into a typed schema. Both directions are pure schema/column
  * transforms — no parsing UDFs.
  */
object TypedJson {

  def suffixFor(dt: DataType): String = dt match {
    case BooleanType => "~b~"
    case _: NumericType => "~n~"
    case StringType => "~s~"
    case TimestampType | TimestampNTZType | DateType => "~n~" // unix secs
    case _: ArrayType => "~N~"
    case _: StructType => "~e~"
    case _ => "~s~"
  }

  private def encodeCol(c: Column, dt: DataType): (String => String, Column) =
    dt match {
      case st: StructType =>
        val inner = st.fields.map { f =>
          val (rename, col2) = encodeCol(c.getField(f.name), f.dataType)
          col2.as(rename(f.name))
        }
        (name => name + "~e~", struct(inner.toIndexedSeq: _*))
      case ArrayType(et, _) =>
        val (rename, _) = encodeCol(lit(null), et)
        // element rename applies inside; arrays wrap as ~N~
        val encoded = et match {
          case st: StructType =>
            transform(c, x => struct(st.fields.map { f =>
              x.getField(f.name).as(f.name + suffixFor(f.dataType))
            }.toIndexedSeq: _*))
          case _ => c
        }
        (name => name + "~N~", encoded)
      case TimestampType | TimestampNTZType =>
        (name => name + "~n~",
         unix_timestamp(c).cast(DoubleType))
      case other =>
        (name => name + suffixFor(other), c)
    }

  /** Rename every column/field with its type suffix (deep). */
  def encode(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      val (rename, c) = encodeCol(col(f.name), f.dataType)
      c.as(rename(f.name))
    }.toIndexedSeq: _*)

  /** Encode to typed JSON-lines strings (the reference's sink format). */
  def encodeJsonLines(df: DataFrame): DataFrame =
    encode(df).select(to_json(struct(col("*"))).as("json"))

  private val SuffixRe = "~[bnseN]~$".r

  /** Strip the type suffixes back off (inverse of [[encode]] for the
    * scalar/struct/array cases). */
  def decode(df: DataFrame): DataFrame = {
    def strip(name: String): String = SuffixRe.replaceFirstIn(name, "")
    def decodeCol(c: Column, dt: DataType): Column = dt match {
      case st: StructType =>
        struct(st.fields.map(f =>
          decodeCol(c.getField(f.name), f.dataType).as(strip(f.name)))
          .toIndexedSeq: _*)
      case ArrayType(st: StructType, _) =>
        transform(c, x => struct(st.fields.map(f =>
          x.getField(f.name).as(strip(f.name))).toIndexedSeq: _*))
      case _ => c
    }
    df.select(df.schema.fields.map(f =>
      decodeCol(col(f.name), f.dataType).as(strip(f.name)))
      .toIndexedSeq: _*)
  }
}
