package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training driver-round curve: trains the same vocabulary
  * sequentially (batchSize 1) and batched, asserts the merge tables
  * are IDENTICAL (the exactness law, at bench scale), and reports the
  * wall time and distributed-round counts — the measured number
  * behind "batching cuts the driver loop ~batchSize× at any corpus
  * size" (a 30-50k-rule production vocabulary is infeasible at one
  * Spark job per merge).
  *
  *   sbt "runMain graft.BpeBench /root/testdata/sf0.1 48 8"
  *
  * ENCODE-CURVE mode (4th arg = corpus multiplier, 5th optional
  * "encode" flag forced when numMerges > 64): trains batched ONLY
  * (the sequential twin at ~1k rules would be thousands of Spark
  * jobs; exactness is already a law at bench scale), then measures
  * the q404/q405 serving path at a PRODUCTION-ish rule count —
  * staged-vocab build wall (Bpe.vocabLengths' chunked application),
  * vocab-table row count, and the corpus encode wall (occurrence
  * explode + broadcast vocab join + per-doc sum). The multiplier
  * synthesizes disjoint isomorphic copies with token-renamed text
  * (the ScaleBench bijection), so vocab grows ~mult× and the row
  * answers the r13 verdict's open question: do the broadcast-join
  * plan's constants hold when BOTH the rule count and the vocab
  * table grow?
  *
  *   sbt "runMain graft.BpeBench /root/testdata/sf0.1 1000 64 1"
  *   sbt "runMain graft.BpeBench /root/testdata/sf0.1 1000 64 10"
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 48
    val batch = if (args.length > 2) args(2).toInt else 8
    val mult = if (args.length > 3) args(3).toInt else 1
    val encodeMode = numMerges > 64 || args.length > 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = new graft.tables.Catalog(spark, sfDir).table("documents")
      .select(col("doc_id"), col("text"))
    // mult disjoint isomorphic copies, token-renamed (the ScaleBench
    // bijection): linear corpus volume, ~mult× distinct-word vocab.
    // Copy bands derive from max(doc_id)+1, NOT a fixed 100000 (r14
    // advice): a corpus whose base ids reach the fixed stride would
    // silently merge copy ids with base ids and collapse the claimed
    // disjoint-copy bijection. [c·band, c·band+mx] ⊂ [c·band,
    // (c+1)·band) makes the bands disjoint BY CONSTRUCTION.
    val band = math.max(100000L,
      base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L)
    val docs = (0 until mult).map { c =>
        if (c == 0) base
        else base
          .withColumn("doc_id", col("doc_id") + lit(c * band))
          .withColumn("text", array_join(transform(
            split(col("text"), " "),
            x => concat(lit(s"c${c}x"), x)), " "))
      }.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .localCheckpoint()
    docs.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    if (!encodeMode) {
      val ((seqMerges, seqRounds), tSeq) = time(
        graft.llm.Bpe.trainWithStats(spark, docs, col("text"), numMerges))
      val ((batMerges, batRounds), tBat) = time(
        graft.llm.Bpe.trainWithStats(spark, docs, col("text"), numMerges,
          batchSize = batch))
      require(seqMerges == batMerges,
        "EXACTNESS VIOLATION: batched merge table diverged from sequential")

      println(f"merges=${seqMerges.size} (asked $numMerges)")
      println(f"${"sequential"}%-12s $tSeq%8.2f s  rounds=$seqRounds")
      println(f"${"batch=" + batch}%-12s $tBat%8.2f s  rounds=$batRounds  " +
        f"identical=${seqMerges == batMerges}")
      println(s"""{"bench":"bpe","merges":${seqMerges.size},""" +
        s""""seq_sec":$tSeq,"seq_rounds":$seqRounds,""" +
        s""""batch":$batch,"batch_sec":$tBat,""" +
        s""""batch_rounds":$batRounds}""")
    } else {
      val ((merges, rounds), tTrain) = time(
        graft.llm.Bpe.trainWithStats(spark, docs, col("text"),
          numMerges, batchSize = batch))
      val (vocab, tVocab) = time {
        val v = graft.llm.Bpe.vocabLengths(spark, docs, col("text"),
          merges).localCheckpoint()
        v.count() // materialize: the build wall, not a lazy stub
        v
      }
      val vocabRows = vocab.count()
      val (encTok, tEncode) = time {
        docs.select(col("doc_id"),
            explode(graft.llm.TextAnalysis.tokens(col("text")))
              .as("word"))
          .join(broadcast(vocab), Seq("word"))
          .groupBy(col("doc_id"))
          .agg(sum(col("wn")).as("n_tok"))
          .agg(sum(col("n_tok"))).collect()(0).getLong(0)
      }
      println(f"merges=${merges.size} (asked $numMerges)  " +
        f"rounds=$rounds  train=$tTrain%.2f s")
      println(f"vocab build=$tVocab%.2f s  rows=$vocabRows  " +
        f"encode=$tEncode%.2f s  bpe_tokens=$encTok  mult=$mult")
      println(s"""{"bench":"bpe_encode","merges":${merges.size},""" +
        s""""batch":$batch,"mult":$mult,"train_sec":$tTrain,""" +
        s""""rounds":$rounds,"vocab_sec":$tVocab,""" +
        s""""vocab_rows":$vocabRows,"encode_sec":$tEncode,""" +
        s""""bpe_tokens":$encTok}""")
    }
    spark.stop()
  }
}
