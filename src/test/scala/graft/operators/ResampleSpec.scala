package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight: deterministic, Poisson(1)-shaped (mean ~ 1, " +
      "~37% zeros), independent across replicates") {
    val ids = (1L to 4000L).toDF("id")
    val w = ids.select(col("id"),
        Resample.poissonWeight(col("id"), lit(1), "t").as("w"))
      .as[(Long, Int)].collect().toMap
    val again = ids.select(col("id"),
        Resample.poissonWeight(col("id"), lit(1), "t").as("w"))
      .as[(Long, Int)].collect().toMap
    assert(w === again)
    val mean = w.values.sum.toDouble / w.size
    assert(mean > 0.9 && mean < 1.1, s"mean $mean")
    val zeros = w.values.count(_ == 0).toDouble / w.size
    assert(zeros > 0.33 && zeros < 0.41, s"zeros $zeros")
    // a different replicate draws a different weight vector
    val w2 = ids.select(col("id"),
        Resample.poissonWeight(col("id"), lit(2), "t").as("w"))
      .as[(Long, Int)].collect().toMap
    assert(w.count { case (k, v) => w2(k) != v } > 1000)
  }

  test("bootstrapMeans: replicate means spread around the true mean; " +
      "exact integer sums") {
    val rows = (1L to 2000L).map(i => ("g", i, (i % 100) * 10))
      .toDF("g", "id", "x")
    val reps = Resample.bootstrapMeans(rows, $"g", $"id", $"x",
        replicates = 20, seed = "b")
      .as[(String, Int, Long, Long, Double)].collect()
    assert(reps.length === 20)
    val trueMean = rows.agg(avg($"x")).as[Double].collect()(0)
    val ms = reps.map(_._5)
    // every replicate lands within a loose band of the truth, and
    // the replicates are not all identical (there IS spread)
    ms.foreach(m => assert(math.abs(m - trueMean) < 60.0))
    assert(ms.distinct.length > 10)
    reps.foreach { case (_, _, sw, swx, m) =>
      assert(m === swx.toDouble / sw.toDouble)
    }
  }
}
