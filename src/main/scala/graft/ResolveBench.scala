package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: decompose a tail query's fixed cost — table
  * resolution (Catalog), plan analysis/optimization, and execution —
  * so "where does the median 0.4 s go" is a measurement, not a guess.
  *   sbt "runMain graft.ResolveBench /root/testdata/sf0.1 q01_groupby_aggs"
  */
object ResolveBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q01_groupby_aggs"
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[resolve] $label: ${(System.nanoTime() - t0) / 1e9}%.4f s")
      r
    }
    (1 to 5).foreach { i =>
      println(s"--- iter $i")
      t("catalog.table(lineitem)") {
        new graft.tables.Catalog(spark, sfDir).table("lineitem")
      }
      val fn = SparkEntry.queries(name)
      val df = t("build (query fn)") { fn(spark, sfDir) }
      t("analyze+optimize+plan") { df.queryExecution.executedPlan }
      t("execute (count)") { df.count() }
      spark.catalog.clearCache()
      Scratch.sweep()
    }
    spark.stop()
  }
}
