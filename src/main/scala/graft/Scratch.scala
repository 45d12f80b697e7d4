package graft
import org.apache.spark.sql.SparkSession

/** Temporary profiling harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    if (args.headOption.contains("__plan")) {
      for (name <- args.drop(1)) {
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode))
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.contains("__recall")) {
      import org.apache.spark.sql.functions._
      val docs = new graft.tables.Catalog(spark, sfDir).table("documents")
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      val found = graft.llm.Dedup.minhashPairs(corpus, col("doc_id"),
        col("text"), 64, 16, 3, 0.5).select("id_a", "id_b")
      val exact = graft.llm.Dedup.ngramJaccardPairs(corpus, col("doc_id"),
        col("text"), 3, 0.5, true, 16).select("id_a", "id_b")
      val nF = found.count(); val nE = exact.count()
      val nHit = found.join(exact, Seq("id_a", "id_b")).count()
      println(f"minhash: found=$nF exact=$nE hit=$nHit recall=${nHit.toDouble/nE}%.4f")
      spark.catalog.clearCache()
      val emb = new graft.tables.Catalog(spark, sfDir).table("embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val ex = graft.llm.Similarity.bruteForceTopK(emb, col("vec_id"),
        col("embedding"), q, col("vec_id"), col("embedding"), 5)
        .select("query_id", "vec_id")
      val nEx = ex.count()
      for ((planes, tables) <- Seq((6, 8), (4, 8), (6, 16), (4, 16), (8, 16))) {
        val ap = graft.llm.Similarity.lshTopK(emb, col("vec_id"),
          col("embedding"), q, col("vec_id"), col("embedding"), 5,
          planes, tables)
          .select("query_id", "vec_id")
        val nHit2 = ap.join(ex, Seq("query_id", "vec_id")).count()
        println(f"lsh-ann p=$planes t=$tables: exact=$nEx hit=$nHit2 recall=${nHit2.toDouble/nEx}%.4f")
      }
      spark.stop(); return
    }
    if (args.contains("__var43")) {
      import org.apache.spark.sql.functions._
      val docs = new graft.tables.Catalog(spark, sfDir).table("documents")
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      def t(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
      // warm the parquet/shingle path
      corpus.select(graft.llm.TextAnalysis.shingleHashes(col("text"), 3))
        .count()
      t("current (posting lists, cap16)")(
        graft.llm.Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"),
          3, 0.5, true, 16).count())
      t("current again (warm)")(
        graft.llm.Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"),
          3, 0.5, true, 16).count())
      spark.stop(); return
    }
    if (args.contains("__prof43")) {
      import org.apache.spark.sql.functions._
      val docs = new graft.tables.Catalog(spark, sfDir).table("documents")
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val sh = corpus.select(col("doc_id").as("id"),
        graft.llm.TextAnalysis.shingleHashes(col("text"), 3).as("s"))
        .filter(size(col("s")) > 0)
      t("shingles count")(sh.count())
      val ex0 = sh.select(col("id"), explode(col("s")).as("g"))
      t("explode count")(ex0.count())
      val keep = ex0.groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") <= 16).select("g")
      val ex = ex0.join(keep, "g")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("capped index materialize")(ex.count())
      val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      val inter = ex.alias("a")
        .join(ex.alias("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
      t("inter count")(inter.count())
      val j = col("n_shared").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_shared")).cast("double")
      val out = inter
        .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .withColumn("jaccard", round(j, 6))
        .filter(col("jaccard") >= 0.5)
      t("final count")(out.count())
      spark.stop(); return
    }
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
