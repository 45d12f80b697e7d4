package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LogParseSpec extends SparkSpec {
  import spark.implicits._

  test("delimited parse: prefix filter, typed casts, malformed skipped") {
    val lines = Seq(
      "EVT|1|click|2.5", "EVT|2|view|notanumber", "GARBAGE xx",
      "EVT|3|click|4.0"
    ).toDF("line")
    val out = LogParse.parseDelimited(lines, col("line"), "EVT",
      Seq(("id", LongType), ("etype", StringType), ("v", DoubleType)))
      .orderBy("id").collect()
    assert(out.length === 3) // garbage line filtered
    assert(out(1).isNullAt(2)) // bad double -> null, not error
    assert(out(2).getDouble(2) === 4.0)
  }

  test("marked JSON parse extracts and decodes the payload") {
    val lines = Seq(
      """PERFDATA: {"suite": "a", "value": 1.5}""",
      """noise line""",
      """PERFDATA: {"suite": "b", "value": 2.5}"""
    ).toDF("line")
    val schema = new StructType().add("suite", StringType)
      .add("value", DoubleType)
    val out = LogParse.parseMarkedJson(lines, col("line"), "PERFDATA",
      schema).orderBy("suite").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(out.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5))
  }

  test("JSON scrub: NaN/Infinity/control chars tolerated, never raised") {
    val lines = Seq(
      """{"a": 1, "b": 2.5}""",
      """{"a": 2, "b": NaN}""",
      """{"a": 3, "b": Infinity}""",
      """{"a": 4, "b": -Infinity}""",
      "{\"a\": 5, \"b\": 1.5, \"c\": \"xy\"}",
      """{totally broken""",
      """{"a": "NaN is fine inside a string", "b": 7.5}"""
    ).toDF("line")
    val schema = new StructType().add("a", StringType)
      .add("b", DoubleType).add("c", StringType)
    val out = LogParse.parseJsonLenient(lines, col("line"), schema)
    assert(out.count() === 7) // nothing dropped, nothing thrown
    // NaN/Inf values land as null, their siblings survive
    val byA = out.collect().map(r => Option(r.get(0)) -> r).toMap
    assert(byA(Some("2")).isNullAt(1) && byA(Some("3")).isNullAt(1) &&
      byA(Some("4")).isNullAt(1))
    assert(byA(Some("5")).getDouble(1) === 1.5)
    assert(byA(Some("5")).getString(2) === "x y") // control char scrubbed
    assert(byA(Some("NaN is fine inside a string")).getDouble(1) === 7.5)
    // fully broken line -> all-null quarantine row
    assert(out.filter(LogParse.isMalformed(
      Seq(col("a"), col("b"), col("c")))).count() === 1)
  }

  test("lcov-style coverage parse (T5): per-file line coverage") {
    // deterministic lcov body derived from the orders table: one section
    // per order-status, one DA line per order (hits = totalprice > 150k)
    val orders = catalog.table("orders")
    val da = orders.select(
      col("o_orderstatus").as("sf"),
      concat(lit("DA:"), col("o_orderkey"), lit(","),
        when(col("o_totalprice") > 150000, 1).otherwise(0)).as("line"))
    val cov = LogParse.coverageFromDaLines(da, col("sf"), col("line"))
      .orderBy("source_file").collect()
    val truth = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("t"),
           sum(when(col("o_totalprice") > 150000, 1L).otherwise(0L))
             .as("c"))
      .orderBy("o_orderstatus").collect()
    assert(cov.length === truth.length)
    cov.zip(truth).foreach { case (g, t) =>
      assert(g.getString(0) === t.getString(0))
      assert(g.getLong(1) === t.getLong(1)) // lines_total
      assert(g.getLong(2) === t.getLong(2)) // lines_covered
    }
  }
}
