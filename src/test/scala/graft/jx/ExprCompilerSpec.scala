package graft.jx

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** JX expression semantics — the null/missing laws that differ from SQL
  * 3VL (SURVEY.md §7 hard parts), evaluated through the real compiler
  * against a tiny frame. */
class ExprCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10.0, ""),
    (2L, "", 20.0, "x"),
    (3L, null.asInstanceOf[String], 30.0, "y")
  ).toDF("id", "s", "n", "t")

  private def eval(json: String): Seq[Any] = {
    val c = ExprCompiler(df)
    df.select(c.compile(ExprParser.parse(json)).as("v"))
      .orderBy($"id").collect().map(_.get(0)).toSeq
  }

  test("missing: null and empty string are both missing") {
    assert(eval("""{"missing": "s"}""") === Seq(false, true, true))
  }

  test("exists is the negation of missing") {
    assert(eval("""{"exists": "s"}""") === Seq(true, false, false))
  }

  test("missing unknown path is always true, never an error") {
    assert(eval("""{"missing": "nope.deep"}""") === Seq(true, true, true))
  }

  test("coalesce skips empty strings") {
    assert(eval("""{"coalesce": ["s", {"literal": "D"}]}""") ===
      Seq("alpha", "D", "D"))
  }

  test("eq is null-safe") {
    assert(eval("""{"eq": ["bad.a", "bad.b"]}""") === Seq(true, true, true))
  }

  test("boolean context coerces missing to false (not 3VL unknown)") {
    // NOT(missing comparison) = NOT(false) = true in JX
    assert(eval("""{"not": {"gt": ["bad.col", 5]}}""") ===
      Seq(true, true, true))
  }

  test("variadic add ignores missing, default only when all missing") {
    assert(eval("""{"add": ["n", "bad.col"]}""") === Seq(10.0, 20.0, 30.0))
    assert(eval("""{"add": ["bad.a", "bad.b"], "default": -1}""") ===
      Seq(-1.0, -1.0, -1.0))
  }

  test("div by zero yields null, not an error") {
    assert(eval("""{"div": ["n", 0]}""") === Seq(null, null, null))
  }

  test("string ops: left/right/not_left/find") {
    assert(eval("""{"left": ["s", 2]}""") === Seq("al", null, null))
    assert(eval("""{"right": ["s", 2]}""") === Seq("ha", null, null))
    assert(eval("""{"not_left": ["s", 2]}""") === Seq("pha", null, null))
    assert(eval("""{"find": ["s", {"literal": "ph"}]}""") ===
      Seq(2, null, null))
  }

  test("string between extracts strictly inside prefix/suffix") {
    val out = eval("""{"between": ["s", "a", "ha"]}""")
    assert(out === Seq("lp", null, null))
  }

  test("when/case respect JX boolean coercion") {
    assert(eval(
      """{"when": {"missing": "s"}, "then": 1, "else": 0}""") ===
      Seq(0, 1, 1))
  }

  test("relative date literals parse deterministically") {
    val t = RelDate.parseMillis("today-7day", 1735689600000L) // 2025-01-01
    assert(t === 1735084800000L) // 2024-12-25
    assert(RelDate.parseMillis("1998-09-02") === 904694400000L)
    assert(RelDate.parseMillis("month+1month", 1735776000000L) ===
      1738368000000L) // Feb 1 2025 from Jan 2
  }

  test("number cast failure yields null (try_cast)") {
    assert(eval("""{"number": "t"}""") === Seq(null, null, null))
  }

  test("regex is anchored full-match") {
    assert(eval("""{"regex": ["s", "al.*"]}""") === Seq(true, null, null))
  }
}
