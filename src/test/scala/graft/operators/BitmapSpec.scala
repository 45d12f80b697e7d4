package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("bitmapWords packs ids into 64-bit words; duplicates OR away; " +
      "bit 63 (sign bit) counts") {
    val rel = Seq(("a", 0L), ("a", 1L), ("a", 1L), ("a", 63L),
      ("a", 64L), ("b", 63L)).toDF("s", "m")
    val w = Bitmap.bitmapWords(rel, $"s", $"m")
      .as[(String, Long, Long)].collect()
      .map { case (s, word, bits) => (s, word) -> bits }.toMap
    assert(w(("a", 0L)) === (1L | 2L | Long.MinValue)) // bits 0,1,63
    assert(w(("a", 1L)) === 1L)
    assert(w(("b", 0L)) === Long.MinValue)
  }

  test("overlap: exact distinct counts and intersections across " +
      "word boundaries") {
    val rel = Seq(
      ("x", 1L), ("x", 2L), ("x", 100L),
      ("y", 2L), ("y", 100L), ("y", 200L),
      ("z", 300L) // shares no word content with x or y
    ).toDF("s", "m")
    val o = Bitmap.overlap(Bitmap.bitmapWords(rel, $"s", $"m"))
      .as[(String, String, Long, Long, Long)].collect()
      .map { case (a, b, na, nb, nc) => (a, b) -> ((na, nb, nc)) }
      .toMap
    assert(o(("x", "y")) === ((3L, 3L, 2L))) // shared: 2 and 100
    // z shares word 4 with nothing -> pair rows absent entirely,
    // or present with 0 only if a word collides; here 300 div 64 = 4
    // and neither x nor y has word 4, so no (x,z)/(y,z) rows
    assert(!o.contains(("x", "z")) && !o.contains(("y", "z")))
  }
}
