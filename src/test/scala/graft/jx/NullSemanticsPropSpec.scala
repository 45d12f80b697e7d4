package graft.jx

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws of the JX null semantics (SURVEY.md §5.3),
  * evaluated through the real compiler on generated frames — one frame
  * per law, row-wise assertions (deterministic fixed-seed sampling;
  * scalacheck used directly since scalatestplus isn't a dependency). */
class NullSemanticsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val strOrMissing: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const(null: String))
  private val numOrMissing: Gen[java.lang.Double] =
    Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(java.lang.Double.valueOf),
      Gen.const(null: java.lang.Double),
      Gen.const(java.lang.Double.valueOf(0.0)))

  test("law: missing(s) iff s is null or empty; left() missing-safe") {
    val xs = samples(strOrMissing, 60)
    val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val c = ExprCompiler(df)
    val out = df.select($"id", $"s",
        c.compile(ExprParser.parse("""{"missing": "s"}""")).as("m"),
        c.compile(ExprParser.parse("""{"left": ["s", 3]}""")).as("l"))
      .collect()
    out.foreach { r =>
      val s = r.getString(1)
      assert(r.getBoolean(2) === (s == null || s.isEmpty), s"missing($s)")
      if (s == null || s.isEmpty) assert(r.isNullAt(3), s"left($s)")
      else assert(r.getString(3) === s.take(3))
    }
  }

  test("law: variadic add ignores missing; all-missing -> default; " +
       "div-by-zero/missing -> null; eq is null-safe") {
    val pairs = samples(Gen.zip(numOrMissing, numOrMissing), 80)
    val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val c = ExprCompiler(df)
    val out = df.select($"id", $"a", $"b",
        c.compile(ExprParser.parse(
          """{"add": ["a", "b"], "default": -99}""")).as("add"),
        c.compile(ExprParser.parse("""{"div": ["a", "b"]}""")).as("div"),
        c.compile(ExprParser.parse("""{"eq": ["a", "b"]}""")).as("eq"))
      .collect()
    out.foreach { r =>
      val a = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any]
      val b = if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[Any]
      val add = if (r.isNullAt(3)) null else r.getDouble(3)
      (a, b) match {
        case (null, null) => assert(add === -99.0)
        case (x: Double, null) => assert(add === x)
        case (null, y: Double) => assert(add === y)
        case (x: Double, y: Double) =>
          assert(math.abs(add.asInstanceOf[Double] - (x + y)) < 1e-6)
      }
      if (b == null || b == 0.0 || a == null)
        assert(r.isNullAt(4), s"div($a,$b) must be null")
      assert(r.getBoolean(5) === (a == b), s"eq($a,$b)")
    }
  }

  test("law: where-filter keeps exactly the rows where the predicate " +
       "is TRUE (missing acts as false)") {
    val xs = samples(numOrMissing, 80)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "n")
    val c = ExprCompiler(df)
    val kept = df.filter(c.filterBool(ExprParser.parse(
      """{"or": [{"gt": ["n", 0]},
                 {"and": [{"lt": ["n", -500000]},
                          {"not": {"missing": "n"}}]}]}"""))).count()
    val expected = xs.count(v =>
      v != null && (v > 0 || v < -500000))
    assert(kept === expected)
  }

  test("law: JX aggregate over generated frame equals SQL aggregate " +
       "with explicit missing handling") {
    val xs = samples(numOrMissing, 100)
    val df = xs.zipWithIndex.map { case (v, i) => (i % 3, v) }
      .toDF("g", "n")
    df.createOrReplaceTempView("prop_frame")
    val got = Runner.runOn(df, QueryParser.parse(
      """{"from": "ignored", "groupby": ["g"],
          "select": [{"name": "s", "value": "n", "aggregate": "sum"},
                     {"name": "c", "value": "n", "aggregate": "count"}],
          "sort": ["g"]}"""))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2)))
    val expected = spark.sql(
      """SELECT g, sum(n) AS s, count(n) AS c FROM prop_frame
         GROUP BY g ORDER BY g""")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((g1, s1, c1), (g2, s2, c2)) =>
      assert(g1 === g2 && c1 === c2)
      (s1, s2) match {
        case (null, null) =>
        case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-6)
        case other => fail(s"sum mismatch: $other")
      }
    }
  }
}
