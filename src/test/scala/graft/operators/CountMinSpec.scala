package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch laws the oracle cannot see from one probe set:
  * never-undercount over EVERY key, fixed sketch size, and cell-wise
  * mergeability of shard sketches. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val d = 3
  private val w = 64

  // zipf-ish stream: key k appears 200/k times, k = 1..40
  private lazy val stream = (1 to 40)
    .flatMap(k => Seq.fill(200 / k)(s"key_$k"))
    .toDF("k")

  test("estimates never undercount, and exact for all keys when " +
      "collisions allow") {
    val sketch = CountMin.build(stream, $"k", d, w)
    val probes = stream.select($"k").distinct()
    val truth = stream.groupBy($"k").agg(count(lit(1)).as("true_n"))
    val got = CountMin.estimate(sketch, probes, $"k", d, w)
      .join(truth, $"key" === $"k")
      .select($"key", $"est", $"true_n")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"undercount for ${r.getString(0)}: ${r.getLong(1)} < ${r.getLong(2)}")
    }
    // overcount bound: est - true <= N (trivial) — check the useful
    // version: the TOTAL overcount across keys is bounded by the
    // collision mass, i.e. average overcount << N
    val n = stream.count()
    val totalOver = got.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(totalOver < n, s"pathological overcount: $totalOver vs N=$n")
  }

  test("an unseen key estimates only collision mass (bounded), and " +
      "the sketch is at most d*w rows") {
    val sketch = CountMin.build(stream, $"k", d, w)
    assert(sketch.count() <= d.toLong * w)
    val est = CountMin.estimate(sketch, Seq("never_seen").toDF("k"),
      $"k", d, w).select($"est").as[Long].head()
    // min over d rows of collision mass; with 40 keys in 64 buckets it
    // must be far below the heaviest key's count (200)
    assert(est < 200, s"unseen key estimated $est")
  }

  test("MERGE law: sketch(a ++ b) == cell-wise sum of shard sketches") {
    val a = stream.filter(length($"k") === 5) // key_1..key_9
    val b = stream.filter(length($"k") =!= 5)
    val whole = CountMin.build(stream, $"k", d, w)
      .withColumnRenamed("n", "n_whole")
    val merged = CountMin.build(a, $"k", d, w)
      .unionByName(CountMin.build(b, $"k", d, w))
      .groupBy($"j", $"bucket").agg(sum($"n").as("n_merged"))
    val diff = whole.join(merged, Seq("j", "bucket"), "full_outer")
      .filter(coalesce($"n_whole", lit(0L)) =!=
        coalesce($"n_merged", lit(0L)))
    assert(diff.count() === 0, "shard sketches must add cell-wise")
  }
}
