package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // 2-d embeddings, two obvious clusters on the axes; ids 0 and 1 are
  // the quantizer centroids (lowest ids)
  private def emb = Seq(
    (0L, Seq(1.0f, 0.0f)),   // centroid A
    (1L, Seq(0.0f, 1.0f)),   // centroid B
    (2L, Seq(0.99f, 0.01f)), // near-dup of 0, cell A
    (3L, Seq(0.01f, 0.99f)), // near-dup of 1, cell B
    (4L, Seq(-1.0f, 0.1f))   // cell B (closer to +y than +x), no dup
  ).toDF("vec_id", "embedding")

  test("assign: nearest centroid, row-local") {
    val a = SemDedup.assign(emb, $"vec_id", $"embedding", nlist = 2)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(a(0L) === 0 && a(2L) === 0)
    assert(a(1L) === 1 && a(3L) === 1)
    assert(a(4L) === 1)
  }

  test("duplicates: only within-cell pairs above threshold, min-id survivor") {
    val d = SemDedup.duplicates(emb, $"vec_id", $"embedding",
        nlist = 2, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("dup_id"),
        r.getAs[Long]("kept_id"), r.getAs[Int]("cell"))).toSet
    assert(d === Set((2L, 0L, 0), (3L, 1L, 1)))
  }

  test("semanticDedup keeps exactly the non-duplicates") {
    val ids = SemDedup.semanticDedup(emb, $"vec_id", $"embedding",
        nlist = 2, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === Set(0L, 1L, 4L))
  }

  test("cross-cell near-identical pairs are NOT compared (the recall trade)") {
    // two near-identical vectors straddling the two cells' boundary:
    // brute force finds the pair, SemDedup (by design) does not
    val e2 = emb.unionByName(Seq(
      (10L, Seq(0.71f, 0.703f)),  // barely cell A
      (11L, Seq(0.703f, 0.71f))   // barely cell B
    ).toDF("vec_id", "embedding"))
    val brute = Dedup.bruteForceEmbeddingPairs(e2, $"vec_id",
        $"embedding", threshold = 0.99)
      .filter($"id_a" === 10L && $"id_b" === 11L).count()
    assert(brute === 1L)
    val sem = SemDedup.duplicates(e2, $"vec_id", $"embedding",
        nlist = 2, threshold = 0.99)
      .filter($"dup_id" === 11L).count()
    assert(sem === 0L)
  }
}
