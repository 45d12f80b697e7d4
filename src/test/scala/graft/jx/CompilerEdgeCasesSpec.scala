package graft.jx

import graft.SparkSpec

/** Edge cases of less-travelled compiler paths: lead (positive rows
  * offset), boolean casts, floor-with-digits, string between on
  * boundaries, edge shorthand, tuple construction. */
class CompilerEdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "prefix-mid-suffix", "true", 12.345),
    (2L, "no-markers-here", "nope", 99.999),
    (3L, "prefix--suffix", "false", -5.5)
  ).toDF("id", "s", "b", "x")

  private def eval(json: String): Seq[Any] = {
    val c = ExprCompiler(df)
    df.select(c.compile(ExprParser.parse(json)).as("v"))
      .orderBy($"id").collect().map(_.get(0)).toSeq
  }

  test("boolean cast: null on unparseable (try_cast)") {
    assert(eval("""{"boolean": "b"}""") === Seq(true, null, false))
  }

  test("floor with digits floors to the decimal grain") {
    assert(eval("""{"floor": ["x", 2]}""") === Seq(12.34, 99.99, -5.5))
  }

  test("string between: empty middle and missing markers") {
    assert(eval("""{"between": ["s", "prefix-", "-suffix"]}""") ===
      Seq("mid", null, ""))
  }

  test("tuple builds a struct") {
    val out = eval("""{"tuple": ["id", "x"]}""")
    val r = out.head.asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getLong(0) === 1L && r.getDouble(1) === 12.345)
  }

  test("lead: positive rows offset looks forward") {
    val out = runner.run(
      """{"from": "orders",
          "select": ["o_orderkey", "next_price"],
          "window": [{"name": "next_price",
                      "value": {"rows": ["o_totalprice", 1]},
                      "edges": ["o_custkey"], "sort": ["o_orderkey"]}],
          "sort": ["o_orderkey"], "limit": 50}""").collect()
    assert(out.length === 50)
    // at least one row has a forward-looking value
    assert(out.exists(!_.isNullAt(1)))
  }

  test("edge shorthand (bare string) uses DefaultDomain") {
    val out = runner.run(
      """{"from": "orders", "edges": ["o_orderstatus"],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).sum === 1500L)
  }

  test("concat skips missing terms (JX concat, not SQL concat)") {
    val d2 = Seq((1L, "a", null.asInstanceOf[String], "c"))
      .toDF("id", "p", "q", "r")
    val c = ExprCompiler(d2)
    val got = d2.select(c.compile(ExprParser.parse(
      """{"concat": ["p", "q", "r"], "separator": "-"}""")).as("v"))
      .collect().head.getString(0)
    assert(got === "a-c") // null term skipped entirely, no double sep
  }

  test("variadic max/min ignore missing operands") {
    assert(eval("""{"max": ["x", "no.such"]}""") ===
      Seq(12.345, 99.999, -5.5))
    assert(eval("""{"min": [{"literal": 50}, "x"]}""") ===
      Seq(12.345, 50.0, -5.5))
  }
}
