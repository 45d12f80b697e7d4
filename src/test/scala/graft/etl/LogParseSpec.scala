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
