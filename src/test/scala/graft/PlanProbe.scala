package graft

/** Dev-only probe: print where BNLJ nodes sit in a query's plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q96_semdedup"
    val df = SparkEntry.queries(name)(TestSpark.spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString
    p.linesIterator.zipWithIndex
      .filter(_._1.contains("BroadcastNestedLoopJoin"))
      .foreach { case (l, i) => println(s"LINE$i: ${l.trim.take(140)}") }
    println("InMemoryTableScan lines: " +
      p.linesIterator.count(_.contains("InMemoryTableScan")))
    println("InMemoryRelation lines: " +
      p.linesIterator.count(_.contains("InMemoryRelation")))
  }
}
