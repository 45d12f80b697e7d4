package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: phase decomposition of the q407 streaming
  * training-build capstone — input prep, stream drain (ingest-time
  * mining), pair mining + closure off the manifests, and the shared
  * chain — so optimization targets inside the 10+ s wall are
  * measurements, not guesses.
  *   sbt "runMain graft.StreamBuildProfile /root/testdata/sf0.1"
  */
object StreamBuildProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // job-count deltas alongside wall time: at bench scale the chain
    // phases are driver-sequential job submissions, so the job count
    // is the deterministic signal wall-clock noise hides
    val jobSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStartMs =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val logJobs = sys.env.contains("SPARK_GRAFT_SBP_JOBS")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobSeen.incrementAndGet()
          if (logJobs) {
            val nm = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            jobStartMs.put(j.jobId, (j.time, nm))
          }
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (logJobs) {
            Option(jobStartMs.remove(j.jobId)).foreach { case (t0, nm) =>
              println(f"[sbpjob] job=${j.jobId}%4d " +
                f"${(j.time - t0) / 1000.0}%7.3f s  $nm")
            }
          }
      })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobSeen.get()
      val r = f
      println(f"[sbp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"(${jobSeen.get() - j0} jobs)")
      r
    }
    (1 to 3).foreach { it =>
      println(s"--- iter $it")
      val docs = QueryShared.tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val src = Scratch.dir("graft_sbp").toString + "/docs"
      t("writeOrderedBatches") {
        graft.streaming.EventStream.writeOrderedBatches(
          Seq(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
            docs.filter(pmod(col("doc_id"), lit(2)) === 1)), src)
      }
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val (cap, sh3, g8, evalg, docHash, _) = t("stream drain (mining)") {
        graft.streaming.EventStream.streamingTrainingArtifacts(spark,
          stream, Scratch.dir("graft_sbpman").toString,
          Scratch.dir("graft_sbpck").toString, k = 15)
      }
      val kept = t("cap truncate") {
        val k = graft.operators.CapSample.truncate(cap, "source",
            Seq("h", "doc_id"), 15)
          .select(col("doc_id"), col("source"), col("n_tok"))
        k.count(); k
      }
      val pairs = t("pair mining (sh3 fold)") {
        val p = graft.llm.Dedup.ngramJaccardPairsFromShingles(sh3,
            threshold = 0.5, maxDf = 16)
          .select(col("id_a"), col("id_b")).localCheckpoint()
        p.count(); p
      }
      val comps = t("connected components") {
        val c = graft.llm.Dedup.connectedComponents(pairs, col("id_a"),
          col("id_b"))
        c.count(); c
      }
      val contamIds = t("contamination join") {
        val ci = g8.join(broadcast(evalg.distinct()), Seq("g"))
          .select(col("doc_id")).distinct().localCheckpoint()
        ci.count(); ci
      }
      t("chain (stages 1-8) + count") {
        QueriesLlmD.profileChain(kept, sh3.select(col("id").as("doc_id")),
          comps, contamIds, docHash).count()
      }
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(tb => spark.catalog.dropTempView(tb.name))
      Scratch.sweep()
    }
    spark.stop()
  }
}
