package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time one named query (repeat N times) against a SF dir.
  *   sbt "runMain graft.BenchOne q52_json_scrub /root/testdata/sf0.1 3"
  * Prints per-iteration seconds and the physical plan on request via
  * SPARK_GRAFT_EXPLAIN=1.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
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
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[benchone] $name iter $i: $dt%.3f s ($rows rows)")
    }
    spark.stop()
  }
}
