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

  test("randomProject matches a driver-side reference computation " +
       "exactly (±integer sums)") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 3.0, 2.0)), (2L, Seq(0.0, 5.0, 1.0, 0.0)))
      .toDF("doc_id", "v")
    val signs = Featurize.projectionSigns(4, 3)
    val got = vecs.select($"doc_id",
        Featurize.randomProject($"v", 4, 3).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val in = Map(1L -> Seq(1.0, 0.0, 3.0, 2.0), 2L -> Seq(0.0, 5.0, 1.0, 0.0))
    for ((id, v) <- in; j <- 0 until 3) {
      val expect = (0 until 4).map(i => v(i) * signs(j)(i)).sum
      assert(got(id)(j) === expect, s"doc $id component $j")
    }
  }

  test("randomProject approximately preserves relative distances " +
       "(JL property) and stays shuffle-free") {
    val docs = catalog.table("documents").limit(300)
      .select($"doc_id", $"text")
    val vecs = Featurize.hashedBow(docs, $"doc_id", $"text", 32)
      .limit(50).cache()
    val proj = vecs.select($"doc_id",
      Featurize.randomProject($"v", 32, 16).as("v"))
    // zero exchanges above the cached vectors: projection is row-local
    // (TREE traversal, not string match — the materialized cache
    // renders its build plan, with its limit Exchange, into the
    // string; the tree above the InMemoryTableScan is what matters)
    val root = proj.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = root.collect {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"projection must not shuffle:\n$root")
    def dists(m: Map[Long, Seq[Double]]): Map[(Long, Long), Double] = {
      val ks = m.keys.toSeq.sorted
      (for (a <- ks; b <- ks if a < b) yield (a, b) ->
        math.sqrt(m(a).zip(m(b)).map(t => (t._1 - t._2) * (t._1 - t._2)).sum))
        .toMap
    }
    val dIn = dists(vecs.as[(Long, Seq[Double])].collect().toMap)
    val dOut = dists(proj.as[(Long, Seq[Double])].collect().toMap)
    // JL with k=16: distances contract/expand within a loose factor;
    // assert rank correlation in aggregate, not per-pair tightness —
    // the projection normalization factor sqrt(k) is deliberately
    // omitted (cosine/ranking downstream is scale-invariant)
    val pairs = dIn.keys.toSeq
    val ratios = pairs.filter(p => dIn(p) > 0).map(p => dOut(p) / dIn(p))
    val mean = ratios.sum / ratios.size
    assert(ratios.count(r => r > mean * 0.2 && r < mean * 2.5) >
      ratios.size * 0.9,
      "projected distances should concentrate around a common scale")
    vecs.unpersist()
  }
}
