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
    // "*(" = whole-stage-codegen span marker in executedPlan.toString
    // (the string "WholeStageCodegen" only appears in formatted explain)
    val tokens = Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "Window ",
      "*(")
    println(f"${"query"}%-26s ${tokens.map(_.take(9)).mkString(" ")} GLOBWIN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        val counts = tokens.map(t =>
          f"${p.sliding(t.length).count(_ == t)}%9d")
        // scale-killer census: Window with an EMPTY partition spec and
        // no limit below it pulls the whole input into one task's sort
        val gw = globalWindows(df.queryExecution.optimizedPlan)
        println(f"$name%-26s ${counts.mkString(" ")} $gw%7d")
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

  /** Count partition-less Windows NOT protected by a limit beneath them
    * — the "single task sorts the whole table" anti-shape. Windows over
    * an already-limited frame (top-k then rank) are fine. */
  def globalWindows(
      lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      GlobalLimit, LocalLimit, Window => LWindow}
    lp.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        !w.child.exists {
          case _: GlobalLimit | _: LocalLimit => true
          case _ => false
        } => w
    }.length
  }
}
