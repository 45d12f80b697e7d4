package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // JX: errors -> null, never throw
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // session bring-up (measured costs are query costs only): exercise
    // the scan + hash-agg + sort codegen paths once, generically
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect()
    // Per-query BEST-OF-2 (cache cleared between iterations): a single
    // timed pass lets one scheduler/GC hiccup dominate a round's
    // headline — r3 recorded one query at 16.8s and r4 another at
    // 22.1s, both of which measure 0.5-4s when re-run. The min is the
    // query's repeatable cost; the per-query max/min spread is reported
    // alongside so outliers are visible instead of silently averaged.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    def cleanup(): Unit = {
      // drop persisted intermediates (outside the timed section) so
      // cached blocks don't accumulate memory pressure across queries;
      // likewise the streaming queries' memory-sink temp views, which
      // clearCache does NOT release
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      // the timed count() has consumed the result, so scratch dirs
      // persisted by the query are safe to delete (outside the timer)
      Scratch.sweep()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        var failed = false
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case _: Throwable => failed = true; -1L }
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          dt
        }
        (name, times.min, times.max, failed)
    }
    val qs = results.map { case (k, mn, _, _) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    // dispersion: max/min per query — ~1.0 means the reading is stable
    // Locale.ROOT: the f-interpolator is locale-sensitive — a
    // comma-decimal default locale would print 1,23 and corrupt the
    // JSON line the driver parses
    val spread = results.map { case (k, mn, mx, _) =>
      s"\"" + k + "\":" + (if (mn > 0)
        String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(mx / mn)) else "null")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // crashed queries are named OUT LOUD: their "times" are
    // time-to-throw, not runtimes — without this list a plan-time
    // crash reads as a fast query (the round-6 lesson)
    val errs = results.filter(_._4).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"queries":$qs,"spread":$spread,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the same dict as a standalone artifact: stdout gets interleaved
    // with sbt/log4j noise and truncation-prone tails (BENCH_r06's
    // parsed:null) — a file survives intact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
    spark.stop()
    // The driver keeps only the LAST ~2000 chars of stdout and parses
    // a JSON line out of that window; with 240+ queries the full line
    // above is ~6k chars, so its head (and the {"metric" anchor) falls
    // outside the window — BENCH_r01..r07 all recorded parsed:null.
    // Emit a SECOND, compact line as the very last stdout: totals +
    // errors always, then the slowest queries greedily while the line
    // stays under budget (window 2000 minus sbt's trailing "[success]
    // …" line). The full per-query dict lives in bench_out.json.
    def f2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val budget = 1700
    val head = s"""{"metric":"total","value":${f2(total)},"unit":"sec","iters":$iters,"errors":$errs,"sf":"$sfDir","full":"$out","queries":{"""
    val slowest = results.sortBy(-_._2)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + 40 // room for the closing/omitted suffix
    var omitted = 0
    slowest.foreach { case (k, mn, _, _) =>
      val e = "\"" + k + "\":" + f2(mn)
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
      else omitted += 1
    }
    val compact = head + entries.mkString(",") +
      s"""},"queries_omitted":$omitted}"""
    println(compact)
  }
}
