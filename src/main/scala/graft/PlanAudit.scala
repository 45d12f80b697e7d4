package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: physical-plan census over every query — join strategy
  * counts, exchange counts, cartesian products — so "is this the plan
  * you'd want at 100x scale" is a table, not 82 manual explains.
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tokens = Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "Window ",
      "WholeStageCodegen")
    println(f"${"query"}%-26s ${tokens.map(_.take(9)).mkString(" ")}")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val counts = tokens.map(t =>
          f"${p.sliding(t.length).count(_ == t)}%9d")
        println(f"$name%-26s ${counts.mkString(" ")}")
      } catch { case e: Throwable =>
        println(f"$name%-26s PLAN-ERROR ${e.getMessage.take(60)}")
      }
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    spark.stop()
  }
}
