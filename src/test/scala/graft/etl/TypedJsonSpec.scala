package graft.etl

import graft.SparkSpec
import graft.tables.SchemaMerge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TypedJsonSpec extends SparkSpec {
  import spark.implicits._

  test("typed-JSON encode: suffixes by type, decode round-trips") {
    val df = Seq((1L, "a", true, 1.5)).toDF("id", "s", "b", "x")
    val enc = TypedJson.encode(df)
    assert(enc.columns.toSet === Set("id~n~", "s~s~", "b~b~", "x~n~"))
    val dec = TypedJson.decode(enc)
    assert(dec.columns.toSet === Set("id", "s", "b", "x"))
    assert(dec.collect() === df.collect())
  }

  test("typed-JSON lines output contains suffixed keys") {
    val df = Seq((1L, "hi")).toDF("id", "s")
    val line = TypedJson.encodeJsonLines(df).as[String].head()
    assert(line.contains("\"id~n~\"") && line.contains("\"s~s~\""))
  }

  test("schema merge: numeric widening, conflict-to-string, union of paths") {
    val a = StructType(Seq(
      StructField("id", LongType), StructField("v", IntegerType),
      StructField("t", BooleanType), StructField("only_a", StringType)))
    val b = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("t", StringType), StructField("only_b", LongType)))
    val m = SchemaMerge.mergeStructs(a, b)
    assert(m("v").dataType === DoubleType)
    assert(m("t").dataType === StringType)
    assert(m.fieldNames.toSet ===
      Set("id", "v", "t", "only_a", "only_b"))
  }

  test("unionAll casts heterogeneous frames and null-fills") {
    val a = Seq((1L, 10)).toDF("id", "v")
    val b = Seq((2L, 2.5, "x")).toDF("id", "v", "extra")
    val u = SchemaMerge.unionAll(Seq(a, b)).orderBy("id")
    assert(u.schema("v").dataType === DoubleType)
    val rows = u.collect()
    assert(rows(0).getDouble(1) === 10.0)
    assert(rows(0).isNullAt(2))
    assert(rows(1).getString(2) === "x")
  }
}
