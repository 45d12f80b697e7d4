object Prof extends App {
  import org.apache.spark.sql.functions._
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  println("=== q14 join ===")
  graft.SparkEntry.queries("q14_join_enrich")(spark, "/root/testdata/sf0.01").explain()
  println("=== q03 edges ===")
  graft.SparkEntry.queries("q03_edges_set_dense")(spark, "/root/testdata/sf0.01").explain()
  println("=== q28 ann ===")
  graft.SparkEntry.queries("q28_ann_cosine")(spark, "/root/testdata/sf0.01").explain()
  spark.stop()
}
