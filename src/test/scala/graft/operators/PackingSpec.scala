package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference spans via the one-partition global window the operator
    * refuses to use — small corpora only. */
  private def windowRef(docs: org.apache.spark.sql.DataFrame,
                        baseOffset: Long) = {
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.filter($"n_tok" > 0)
      .withColumn("cum", sum($"n_tok").over(w))
      .select($"doc_id", $"n_tok",
        ($"cum" - $"n_tok" + baseOffset).as("s"),
        ($"cum" - 1 + baseOffset).as("e"))
  }

  test("spans ≡ global-window reference on a COHORT-CLUSTERED id " +
      "corpus, and the rank cuts keep buckets balanced where " +
      "maxId/256 strides would pile both cohorts into two buckets") {
    // two dense cohorts at opposite ends of a sparse id space — the
    // append-batch shape (q355 adds +2,000,000 offsets): value-spaced
    // strides put cohort 1 entirely in bucket 0 and cohort 2 in the
    // top bucket
    val docs = spark.range(2000L).select(
      when($"id" < 1000, $"id")
        .otherwise($"id" - 1000 + 2000000L).as("doc_id"),
      (pmod($"id", lit(7L)) + 1).as("n_tok"))
    val got = Packing.spans(docs, $"doc_id", $"n_tok")
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val want = windowRef(docs, 0L)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)

    // balance law: bucket sizes under the rank cuts stay within a
    // small factor of n/256 even though the id axis is 99.9% empty
    val base = docs.select($"doc_id", $"n_tok")
    val cuts = Packing.rankCuts(base)
    assert(cuts.size === 255)
    val sizes = base.withColumn("bk",
        size(filter(lit(cuts.toArray), c => c <= $"doc_id")))
      .groupBy($"bk").count().as[(Int, Long)].collect()
    val maxBucket = sizes.map(_._2).max
    assert(maxBucket <= 4 * (2000 / 256 + 1),
      s"rank-spaced buckets must stay balanced, worst = $maxBucket")
    // the value-spaced stride this replaced really does collapse:
    // every cohort-1 id lands in stride bucket 0
    val stride = 2000999L / 256L + 1L
    val strideWorst = base
      .withColumn("bk", expr(s"doc_id div $stride"))
      .groupBy($"bk").count().as[(Long, Long)].collect()
      .map(_._2).max
    assert(strideWorst >= 1000L,
      "fixture must exhibit the skew the rank cuts are for")
  }

  test("spans with baseOffset lays a fresh batch after the persisted " +
      "history total (the q355 incremental contract)") {
    val docs = spark.range(500L).select(
      ($"id" * 3 + 11).as("doc_id"), lit(5L).as("n_tok"))
    val got = Packing.spans(docs, $"doc_id", $"n_tok", baseOffset = 777L)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val want = windowRef(docs, 777L)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.head._3 === 777L)
  }

  test("zero-token docs occupy no span; an all-zero corpus yields an " +
      "empty frame") {
    val docs = Seq((1L, 0L), (2L, 4L), (3L, 0L), (4L, 2L))
      .toDF("doc_id", "n_tok")
    val got = Packing.spans(docs, $"doc_id", $"n_tok")
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 4L, 0L, 3L), (4L, 2L, 4L, 5L)))
    val empty = Packing.spans(
      Seq((1L, 0L)).toDF("doc_id", "n_tok"), $"doc_id", $"n_tok")
    assert(empty.count() === 0L)
  }

  test("chunkCensus + withFill: per-chunk docs/starts/fill replay a " +
      "direct per-token computation") {
    // 4 docs of 3 tokens, L = 5: chunks 0..2, doc 2 straddles 0/1
    val docs = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "n_tok")
    val sp = Packing.spans(docs, $"doc_id", $"n_tok")
    val census = Packing.withFill(
        Packing.chunkCensus(sp, 5L), 5L, lit(12L))
      .orderBy($"chunk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // spans: [0,2] [3,5] [6,8] [9,11]; chunks of 5: 0=[0,4] 1=[5,9] 2=[10,11]
    assert(census === Seq(
      (0L, 2L, 2L, 5L),   // docs 1,2 touch; 1,2 start; full
      (1L, 3L, 2L, 5L),   // docs 2,3,4 touch; 3,4 start; full
      (2L, 1L, 0L, 2L)))  // doc 4 tail; 2 tokens remain
  }

  test("takedown execution laws (the q408 contract): hole-punch " +
      "keeps every surviving span at its original offset — clean " +
      "chunks are byte-identical by construction — while a full " +
      "repack shifts exactly the survivors after the first hole " +
      "by the removed token mass") {
    // 6 docs × 4 tokens, L = 5; remove doc 3 (span [8,11] — touches
    // chunks 1 and 2)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("doc_id", "n_tok")
    val all = Packing.spans(docs, $"doc_id", $"n_tok")
      .withColumn("removed", $"doc_id" === 3L)
    // hole-punch: the post layout IS the pre layout minus removed
    // spans — offsets unchanged, so every chunk without a removed
    // fragment keeps its exact fragment set
    val frags = all.withColumn("chunk",
        explode(sequence(expr("s div 5"), expr("e div 5"))))
      .select($"doc_id", $"removed", $"chunk",
        greatest($"s", $"chunk" * 5).as("fs"),
        least($"e", ($"chunk" + 1) * 5 - 1).as("fe"))
    val affectedChunks = frags.filter($"removed")
      .select($"chunk").distinct().as[Long].collect().toSet
    assert(affectedChunks === Set(1L, 2L), "doc 3 spans chunks 1-2")
    def cleanSet(f: org.apache.spark.sql.DataFrame) =
      f.filter(!$"chunk".isin(affectedChunks.toSeq: _*))
        .select($"doc_id", $"chunk", $"fs", $"fe")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(cleanSet(frags) === cleanSet(frags.filter(!$"removed")),
      "clean chunks must contain zero removed fragments, so the " +
        "survivor restriction changes nothing (content invariance)")
    // full repack: survivors BEFORE the hole keep their span; every
    // survivor AFTER it shifts left by exactly the removed mass (4)
    val repacked = Packing.spans(docs.filter($"doc_id" =!= 3L),
      $"doc_id", $"n_tok")
    val joined = all.filter(!$"removed")
      .select($"doc_id", $"s".as("s_pre"))
      .join(repacked.select($"doc_id", $"s".as("s_post")), "doc_id")
      .as[(Long, Long, Long)].collect().toMap2
    assert(joined(1L) === (0L, 0L) && joined(2L) === (4L, 4L),
      "survivors before the hole must not move")
    assert(Seq(4L, 5L, 6L).forall(d =>
      joined(d)._2 === joined(d)._1 - 4L),
      "survivors after the hole shift by the removed token mass")
  }

  test("takedown FOLD laws (the q412 contract): overlapping / " +
      "redelivered notice batches fold to the one-shot census on " +
      "the doc_id key; the subtractive clean digest equals a direct " +
      "clean-chunk recompute through BOTH manifest paths; and " +
      "tokens_moved's closed form equals the survivor-shift sum") {
    val L = 5L
    val MOD = 1000000007L
    // 12 docs × 4 tokens, L = 5 → 10 chunks, heavy chunk-straddling
    val docs = (1L to 12L).map((_, 4L)).toDF("doc_id", "n_tok")
    val sp = Packing.spans(docs, $"doc_id", $"n_tok")
      .localCheckpoint()
    val frIdx = Takedown.fragmentIndex(sp, L).localCheckpoint()
    val chDig = Takedown.chunkDigests(frIdx, MOD).localCheckpoint()
    val totals = Takedown.packTotals(sp, chDig, L, MOD)
      .localCheckpoint()
    def census(ids: Seq[Long]*) = {
      // append each notice batch (layout lookup), dedup at the fold
      val removed = ids.map(b =>
          sp.join(b.toDF("doc_id"), Seq("doc_id")))
        .reduce(_ unionByName _).dropDuplicates("doc_id")
      Takedown.foldCensus(removed, frIdx, chDig, totals, L, MOD)
        .collect()(0)
    }
    // overlap (7 in both batches) + redelivery (batch 1 twice) must
    // equal the one-shot union {3, 7, 11}
    val folded = census(Seq(3L, 7L), Seq(7L, 11L), Seq(3L, 7L))
    val oneShot = census(Seq(3L, 7L, 11L))
    assert(folded === oneShot,
      "fold over overlapping + redelivered batches ≡ one-shot union")
    // the two digest paths agree with each other AND with a direct
    // recompute of the clean-chunk fragment hashes
    val pre = folded.getAs[Long]("clean_digest_pre")
    val post = folded.getAs[Long]("clean_digest_post")
    assert(pre === post, "manifest-subtraction digest must equal " +
      "the fresh-hash subtraction (manifest integrity)")
    val affected = sp
      .join(Seq(3L, 7L, 11L).toDF("doc_id"), Seq("doc_id"))
      .withColumn("chunk",
        explode(sequence(expr(s"s div $L"), expr(s"e div $L"))))
      .select($"chunk").distinct()
    val direct = frIdx.join(affected, Seq("chunk"), "left_anti")
      .withColumn("__h", conv(substring(md5(concat(lit("frag:"),
          $"doc_id".cast("string"), lit(":"),
          $"fs".cast("string"), lit(":"),
          $"fe".cast("string")).cast("binary")), 1, 7), 16, 10)
        .cast("long"))
      .agg(pmod(sum($"__h"), lit(MOD))).collect()(0).getLong(0)
    assert(pre === direct,
      "subtractive digest must equal the direct clean-chunk sum")
    // tokens_moved closed form (total - minrs - pad) vs the explicit
    // survivor-shift sum the one-shot census defines
    val minrs = sp.filter($"doc_id".isin(3L, 7L, 11L))
      .agg(min($"s")).collect()(0).getLong(0)
    val shiftSum = sp.filter(!$"doc_id".isin(3L, 7L, 11L) &&
        $"s" > minrs)
      .agg(sum($"n_tok")).collect()(0).getLong(0)
    assert(folded.getAs[Long]("tokens_moved") === shiftSum,
      "closed-form tokens_moved must equal the survivor-shift sum")
    // and the fixture is non-degenerate: some chunks affected, some
    // clean, overlap actually removed exactly 3 docs
    assert(folded.getAs[Long]("n_removed_docs") === 3L)
    assert(folded.getAs[Long]("n_affected") > 0L)
    assert(folded.getAs[Long]("n_clean") > 0L)
  }

  test("migration prefix-reuse law (the q413 contract): when two " +
      "packings agree on a doc-count prefix, every chunk before " +
      "floor(s_firstChanged / L) has an IDENTICAL fragment set in " +
      "both layouts — the chunks the migration does not rewrite — " +
      "and the first divergent-count doc bounds the reuse exactly " +
      "(at the suite SF doc 0 itself changes, so the nonzero-prefix " +
      "state lives here)") {
    val L = 5L
    // docs 1..4 keep their counts across the migration; doc 5 shrinks
    val v1 = Seq((1L, 3L), (2L, 4L), (3L, 3L), (4L, 4L), (5L, 4L),
      (6L, 3L)).toDF("doc_id", "n_tok")
    val v2 = Seq((1L, 3L), (2L, 4L), (3L, 3L), (4L, 4L), (5L, 2L),
      (6L, 3L)).toDF("doc_id", "n_tok")
    val s1 = Packing.spans(v1, $"doc_id", $"n_tok").localCheckpoint()
    val s2 = Packing.spans(v2, $"doc_id", $"n_tok").localCheckpoint()
    val sfc = s1.filter($"doc_id" === 5L)
      .select($"s").collect()(0).getLong(0)
    val unchanged = sfc / L // = the q413 chunks_unchanged
    assert(sfc === 14L && unchanged === 2L,
      "fixture must exercise a NONZERO unchanged prefix")
    def fragsBefore(sp: org.apache.spark.sql.DataFrame) =
      Takedown.fragmentIndex(sp, L)
        .filter($"chunk" < unchanged)
        .select($"chunk", $"doc_id", $"fs", $"fe")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(fragsBefore(s1) === fragsBefore(s2),
      "chunks before the first changed doc's start chunk must be " +
        "byte-identical across the migration")
    // the bound is CONSERVATIVE, not always tight: the chunk holding
    // s_fc can coincidentally match (here doc 5's first fragment
    // (14,14) is identical under both layouts) — but the layouts must
    // diverge SOMEWHERE at or after it, or the census would be
    // under-reporting reusable chunks on a changed corpus
    def fragsFrom(sp: org.apache.spark.sql.DataFrame) =
      Takedown.fragmentIndex(sp, L).filter($"chunk" >= unchanged)
        .select($"chunk", $"doc_id", $"fs", $"fe")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(fragsFrom(s1) !== fragsFrom(s2),
      "a changed corpus must diverge at or after the reuse bound")
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] =
      rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
