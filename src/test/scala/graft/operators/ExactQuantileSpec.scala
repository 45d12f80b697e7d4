package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(String, Double)], p: Double)
      : Map[String, (Long, Double)] =
    rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val r = math.ceil(p * sorted.length).toInt
      g -> ((sorted.length.toLong, sorted(r - 1)))
    }

  test("LAW: matches the sorted-collect definition on randomized " +
      "groups with ties, skew and tiny groups (seeded)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3; p <- Seq(0.25, 0.5, 0.9, 1.0)) {
      val rows = (1 to 500).map { _ =>
        val g = s"g${rnd.nextInt(4)}"
        // heavy ties: values drawn from a small grid
        (g, (rnd.nextInt(20) * 2.5) - 10.0)
      } ++ Seq(("solo", 42.0)) // single-element group
      val got = ExactQuantile.quantileDisc(
          rows.toDF("g", "v"), $"g", $"v", p, buckets = 8)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === reference(rows, p),
        s"trial $trial p $p buckets=8 diverged")
    }
  }

  test("nulls are ignored; a constant group returns the constant") {
    val rows = Seq(("a", Some(5.0)), ("a", None), ("a", Some(1.0)),
      ("c", Some(7.0)), ("c", Some(7.0)), ("c", Some(7.0)))
      .toDF("g", "v")
    val out = ExactQuantile.quantileDisc(rows, $"g", $"v", 0.5)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("a" -> ((2L, 1.0)), "c" -> ((3L, 7.0))))
  }
}
