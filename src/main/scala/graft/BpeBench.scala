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
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val numMerges = if (args.length > 1) args(1).toInt else 48
    val batch = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = new graft.tables.Catalog(spark, sfDir).table("documents")
      .select(col("text")).localCheckpoint()
    docs.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
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
    spark.stop()
  }
}
