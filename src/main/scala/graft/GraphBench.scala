package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank cost decomposition at sf scale — where q141/q146's wall
  * time actually goes: the one-off co-occurrence edge build (distinct
  * self-join) vs the per-iteration loop, and the price of the
  * deterministic (sorted-fold) mode over the plain sum.
  *
  *   sbt "runMain graft.GraphBench /root/testdata/sf0.1"
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val li = new graft.tables.Catalog(spark, sfDir).table("lineitem")
      .filter(pmod(col("l_partkey"), lit(4)) === 0)
    val (edges, tBuild) = time {
      val e = Graph.coOccurrenceEdges(li, col("l_orderkey"),
          col("l_partkey"))
        .localCheckpoint()
      (e, e.count())
    }
    val nEdges = edges._2
    val nNodes = edges._1.select(col("src")).distinct().count()

    val (_, tPlain) = time {
      Graph.pageRank(edges._1, iterations = 3).count()
    }
    val (_, tDet) = time {
      Graph.pageRank(edges._1, iterations = 3,
        deterministic = true).count()
    }
    println(f"edges=$nEdges nodes=$nNodes build=$tBuild%6.2f s  " +
      f"3-iter plain=$tPlain%6.2f s  det=$tDet%6.2f s")
    println(s"""{"bench":"graph","edges":$nEdges,"nodes":$nNodes,""" +
      s""""build_sec":$tBuild,"plain3_sec":$tPlain,"det3_sec":$tDet}""")
    spark.stop()
  }
}
