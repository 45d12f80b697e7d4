package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.EventStream

/** Dev harness: micro-batch lifecycle decomposition of the
  * stream-stream outer interval joins (q156/q189) — per batch, where
  * the wall goes: source discovery (latestOffset/getBatch), query
  * re-planning, state-store commit, WAL/offset commit, and the
  * addBatch execution itself. Guide §7.3: measure the lifecycle
  * before touching anything.
  *   sbt "runMain graft.StreamJoinProfile /root/testdata/sf0.1"
  */
object StreamJoinProfile {
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

    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def g(k: String): Long =
          Option(d.get(k)).map(_.longValue()).getOrElse(-1L)
        val states = p.stateOperators.map { so =>
          s"commit=${so.commitTimeMs}ms rows=${so.numRowsTotal} " +
            s"mem=${so.memoryUsedBytes}"
        }.mkString(" | ")
        println(s"[sjp] batch=${p.batchId} total=${g("triggerExecution")}" +
          s" latestOffset=${g("latestOffset")} getBatch=${g("getBatch")}" +
          s" plan=${g("queryPlanning")} wal=${g("walCommit")}" +
          s" offsets=${g("commitOffsets")} addBatch=${g("addBatch")}" +
          s" state[$states]")
      }
    }
    spark.streams.addListener(listener)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sjp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { it =>
      println(s"--- iter $it")
      t("q156 total") {
        val events = EventStream.normalizeEventTime(
            QueryShared.tbl(spark, dir, "events"))
          .filter(pmod(col("user_id"), lit(3)) === 0 &&
            col("event_type").isin("view", "purchase"))
          .select(col("ts"), col("event_type"), col("user_id"),
            col("event_id"))
        val src = Scratch.dir("graft_sjp156").toString
        t("  input prep") {
          events.coalesce(1).write.mode("append").parquet(src)
          spark.createDataFrame(Seq(
              (new java.sql.Timestamp(1709251200000L), "view", -1L, -1L),
              (new java.sql.Timestamp(1709251200000L), "purchase",
                -2L, -2L)))
            .toDF("ts", "event_type", "user_id", "event_id")
            .coalesce(1).write.mode("append").parquet(src)
        }
        def stream = spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val views = stream.filter(col("event_type") === "view")
          .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
            col("event_id").as("a_id"))
        val purchases = stream.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
        val joined = EventStream.leftOuterIntervalJoin(
          views, "a_ts", purchases, "b_ts",
          col("a_user") === col("b_user") &&
            col("b_ts") >= col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("interval 30 minutes"),
          watermark = "1 second")
        val drained = t("  drain") {
          val df = EventStream.runToCompletion(spark, joined,
            mode = "append")
          df.count(); df
        }
        t("  readout") {
          drained.filter(col("a_user") >= 0)
            .agg(count(lit(1)).as("n_rows"),
              count(col("b_ts")).as("n_matched")).count()
        }
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
