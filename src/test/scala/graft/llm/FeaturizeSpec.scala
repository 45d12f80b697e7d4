package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  test("hashedBow: counts land in md5 slots, repeats accumulate") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Featurize.hashedBow(docs, $"doc_id", $"text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.size === 2) // token-less doc emits nothing
    assert(out(1L).sum === 3.0 && out(2L).sum === 1.0)
    assert(out(1L).length === 16)
    // doc 2's single slot is a subset of doc 1's, with count 1 vs 2
    val aSlot = out(2L).indexWhere(_ > 0)
    assert(out(2L)(aSlot) === 1.0 && out(1L)(aSlot) === 2.0)
  }

  test("native kernel is bit-identical to the relational construction") {
    val docs = catalog.table("documents").limit(200)
      .select($"doc_id", $"text")
    val kernel = Featurize.hashedBow(docs, $"doc_id", $"text", 32)
    val relational = Featurize.hashedBowRelational(docs, $"doc_id",
      $"text", 32)
    assert(kernel.exceptAll(relational).isEmpty &&
           relational.exceptAll(kernel).isEmpty)
  }

  test("hashedBow vectors make near-dup text detectable via SemDedup") {
    val base = (1 to 6).map(i => (i.toLong,
      s"document number $i talks about topic$i in many plain words " +
        s"that repeat topic$i topic$i and some filler text here"))
    val variants = base.take(3).map { case (i, t) =>
      (i + 100L, t.dropRight(25)) } // near-dup of docs 1-3
    val docs = (base ++ variants).toDF("doc_id", "text")
    val vecs = Featurize.hashedBow(docs, $"doc_id", $"text", dim = 32)
    val dups = SemDedup.duplicates(vecs, $"doc_id", $"v",
        nlist = 2, threshold = 0.9)
      .select("dup_id", "kept_id").as[(Long, Long)].collect().toMap
    (1L to 3L).foreach { i =>
      assert(dups.get(i + 100L).contains(i),
        s"variant of doc $i should be detected as its near-dup")
    }
  }
}
