object Prof extends App {
  import org.apache.spark.sql.functions._
  import graft.llm._
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  val truncated = docs.select(
    (col("doc_id") + 1000000L).as("doc_id"),
    array_join(slice(TextAnalysis.tokens(col("text")), lit(1),
      greatest(TextAnalysis.tokenCount(col("text")) - 5, lit(1))), " ")
      .as("text"))
  val corpus = docs.select(col("doc_id"), col("text")).unionByName(truncated)
    .cache()
  println("corpus " + corpus.count())
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs  n=$n")
  }
  val withSig = corpus
    .select(col("doc_id").as("id"),
      TextAnalysis.shingleHashes(col("text"), 3).as("sh"))
    .filter(size(col("sh")) > 0)
    .withColumn("h2s", transform(col("sh"), h => xxhash64(h, lit(1L))))
    .withColumn("sig", Dedup.minhashSignature(col("sh"), col("h2s"), 64))
    .select("id", "sh", "sig")
    .persist()
  t("withSig materialize")(withSig.count())
  val banded = withSig.select(col("id"),
    posexplode(array((0 until 16).map { b =>
      xxhash64(concat_ws(",", (0 until 4).map(r => col("sig")(b * 4 + r)): _*))
    }: _*)).as(Seq("band", "bh")))
  t("banded")(banded.count())
  t("bucket sizes")(banded.groupBy("band", "bh").count()
    .filter(col("count") > 1).count())
  val candidates = banded.join(
      banded.withColumnRenamed("id", "id_b"), Seq("band", "bh"))
    .filter(col("id") < col("id_b"))
    .select(col("id").as("id_a"), col("id_b")).distinct()
  t("candidates")(candidates.count())
  val verified = candidates
    .join(withSig.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
    .join(withSig.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
    .filter(col("jaccard") >= 0.5)
  t("verified")(verified.count())
  spark.stop()
}
