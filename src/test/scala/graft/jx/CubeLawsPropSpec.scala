package graft.jx

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws of the dense-cube edges model (SURVEY.md §2e) —
  * the flagship JX semantic — evaluated through the REAL runner on
  * generated frames and checked cell-by-cell against an independent
  * driver-side reference computation (deterministic fixed-seed
  * sampling, same approach as NullSemanticsPropSpec).
  *
  * Laws:
  *  1. completeness — the output has exactly one row per domain-product
  *     cell (+ the overflow partition per allowNulls edge), regardless
  *     of the data;
  *  2. cell correctness — every cell's count and sum equal the
  *     reference computed row-by-row on the driver (out-of-domain,
  *     missing, and out-of-range values land in the overflow partition
  *     iff allowNulls, else vanish);
  *  3. totals — with allowNulls on every edge, cell counts sum to the
  *     row count (nothing lost, nothing duplicated).
  */
class CubeLawsPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private val alphabet = Seq("a", "b", "c", "d", "e", "f")
  private val gGen: Gen[String] = Gen.oneOf(
    Gen.oneOf(alphabet), Gen.const(null: String), Gen.const(""),
    Gen.const("zz"))
  private val vGen: Gen[java.lang.Double] = Gen.oneOf(
    Gen.chooseNum(-10.0, 30.0).map(java.lang.Double.valueOf),
    Gen.const(null: java.lang.Double))

  /** One randomized trial: build a frame + a 2-edge cube query, run it,
    * compare every cell against the driver-side reference. */
  private def trial(seed: Long, parts: Seq[String], interval: Double,
                    gNulls: Boolean, vNulls: Boolean): Unit = {
    val (vMin, vMax) = (0.0, 20.0)
    val rows = samples(Gen.zip(gGen, vGen), 150, seed)
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val q = QueryParser.parse(s"""
      {"edges": [
         {"name": "g", "value": "g", "allowNulls": $gNulls,
          "domain": {"type": "set",
                     "partitions": [${parts.map("\"" + _ + "\"").mkString(",")}]}},
         {"name": "vb", "value": "v", "allowNulls": $vNulls,
          "domain": {"type": "range", "min": $vMin, "max": $vMax,
                     "interval": $interval}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_v", "value": "v", "aggregate": "sum"}],
       "from": "ignored"}""")
    val out = Runner.runOn(df, q).collect()

    // reference buckets, same arithmetic as the engine's (IEEE floor)
    def gB(s: String): Option[String] =
      if (s != null && parts.contains(s)) Some(s) else None
    def vB(v: java.lang.Double): Option[Double] =
      if (v != null && v >= vMin && v < vMax)
        Some(math.floor((v - vMin) / interval) * interval + vMin)
      else None
    val vDomain =
      (0 until math.ceil((vMax - vMin) / interval).toInt)
        .map(i => vMin + i * interval)
    // reference cells: bucket each row; a null bucket survives only on
    // an allowNulls edge
    val kept = rows.flatMap { case (g, v) =>
      val (gb, vb) = (gB(g), vB(v))
      if ((gb.isDefined || gNulls) && (vb.isDefined || vNulls))
        Some(((gb.orNull: Any, vb.map(_.asInstanceOf[Any]).orNull), v))
      else None
    }
    val expCells: Seq[(Any, Any)] = for {
      gd <- parts.map(_.asInstanceOf[Any]) ++
        (if (gNulls) Seq(null) else Nil)
      vd <- vDomain.map(_.asInstanceOf[Any]) ++
        (if (vNulls) Seq(null) else Nil)
    } yield (gd, vd)

    // law 1: completeness
    assert(out.length === expCells.size,
      s"seed=$seed cells ${out.length} != ${expCells.size}")
    val got = out.map { r =>
      (r.get(0), r.get(1)) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[Any]))
    }.toMap
    assert(got.keySet === expCells.toSet, s"seed=$seed cell keys differ")

    // law 2: per-cell count + sum
    val byCell = kept.groupBy(_._1)
    expCells.foreach { cell =>
      val rowsIn = byCell.getOrElse(cell, Nil).map(_._2)
      val (n, sum) = got(cell)
      assert(n === rowsIn.size.toLong, s"seed=$seed count at $cell")
      val vs = rowsIn.filter(_ != null).map(_.doubleValue)
      if (vs.isEmpty) assert(sum == null, s"seed=$seed empty sum at $cell")
      else {
        val expSum = vs.sum
        val gotSum = sum.asInstanceOf[Double]
        assert(math.abs(gotSum - expSum) <=
          1e-9 * math.max(1.0, math.abs(expSum)),
          s"seed=$seed sum at $cell: $gotSum vs $expSum")
      }
    }

    // law 3: totals with allowNulls everywhere
    if (gNulls && vNulls)
      assert(got.values.map(_._1).sum === rows.size.toLong,
        s"seed=$seed total rows")
  }

  test("law: dense cube cells complete and correct on random frames " +
       "(allowNulls on)") {
    trial(seed = 100, parts = Seq("a", "b", "c"), interval = 5.0,
      gNulls = true, vNulls = true)
    trial(seed = 200, parts = Seq("b", "e"), interval = 2.0,
      gNulls = true, vNulls = true)
    trial(seed = 300, parts = alphabet, interval = 10.0,
      gNulls = true, vNulls = true)
  }

  test("law: without allowNulls, out-of-domain rows vanish and no " +
       "overflow cell exists") {
    trial(seed = 400, parts = Seq("a", "c", "f"), interval = 4.0,
      gNulls = false, vNulls = false)
    trial(seed = 500, parts = Seq("d"), interval = 20.0,
      gNulls = false, vNulls = false)
  }

  test("law: mixed allowNulls — overflow only on the flagged edge") {
    trial(seed = 600, parts = Seq("a", "b"), interval = 5.0,
      gNulls = true, vNulls = false)
    trial(seed = 700, parts = Seq("c", "d", "e"), interval = 2.0,
      gNulls = false, vNulls = true)
  }
}
