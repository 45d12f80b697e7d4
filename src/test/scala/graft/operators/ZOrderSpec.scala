package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a reference Morton implementation") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1L),
      (513L, 770L), (1023L, 1023L))
    val got = cases.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === morton(a, b, 10), s"z($a,$b)")
    }
    // interleave is a bijection on the bounded domain: max input pair
    // maps to the all-ones 20-bit value
    assert(got.last._3 === (1L << 20) - 1)
  }

  test("z-ordered layout bounds per-file width on BOTH columns; " +
       "single-column sort leaves the other column unclustered") {
    val n = 20000
    // a pseudo-random but deterministic point cloud over 1024x1024
    val pts = spark.range(n).select(
      pmod(xxhash64($"id"), lit(1024L)).as("a"),
      pmod(xxhash64($"id", lit(1)), lit(1024L)).as("b"))
    val dir = graft.Scratch.dir("graft_zorder")
      .toString

    ZOrder.writeZOrdered(pts, dir + "/z", $"a", $"b", bits = 10,
      nFiles = 16)
    pts.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.parquet(dir + "/bya")

    def widths(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"a") - min($"a")).as("wa"),
             (max($"b") - min($"b")).as("wb"))
        .agg(avg($"wa"), avg($"wb")).as[(Double, Double)].head()
      per
    }
    val (zA, zB) = widths(dir + "/z")
    val (sA, sB) = widths(dir + "/bya")
    // z-layout: 16 z-ranges fix ~2 high bits of each dimension ->
    // rectangles ~1/4 of the range per side (+ sampling slop at the
    // range-partition boundaries)
    assert(zA < 1024 * 0.6, s"z-layout a-width $zA")
    assert(zB < 1024 * 0.6, s"z-layout b-width $zB")
    // single-column sort: perfect on a, no clustering at all on b
    assert(sA < 1024 * 0.2, s"a-sort a-width $sA")
    assert(sB > 1024 * 0.9, s"a-sort b-width $sB")
    // and the z-layout's worst side beats the a-sort's worst side 2x+
    assert(math.max(zA, zB) * 2 < math.max(sA, sB))
  }
}
