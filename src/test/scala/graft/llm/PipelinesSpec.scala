package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("prepareCorpus: dedups exact + near dups, keeps quality floor") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then it was done for the day"),
      (2L, "the quick brown fox jumps over the lazy dog and then it was done for the day"),
      (3L, "the quick brown fox jumps over the lazy dog and then it was done for the"),
      (4L, "a completely different document that is about the spark engine and its catalyst optimizer for it was a good engine"),
      (5L, "xq") // too short -> fails quality floor
    ).toDF("doc_id", "text")
    val out = Pipelines.prepareCorpus(docs, $"doc_id", $"text",
      minQuality = 0.4, nearDupJaccard = 0.6)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L)) // survivor of 1/2/3 cluster
    assert(!ids.contains(2L)) // exact dup removed
    assert(!ids.contains(3L)) // near dup removed
    assert(ids.contains(4L))
    assert(!ids.contains(5L)) // quality-filtered
    assert(out.columns.contains("lang_pred") &&
      out.columns.contains("quality"))
  }

  test("writeByLanguage partitions on disk by lang_pred") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_corpus")
      .toString
    val docs = catalog.table("documents").limit(200)
    val prepared = Pipelines.prepareCorpus(docs, $"doc_id", $"text",
      minQuality = 0.0, nearDupJaccard = 0.95)
    Pipelines.writeByLanguage(prepared, tmp)
    val parts = new java.io.File(tmp).listFiles()
      .map(_.getName).filter(_.startsWith("lang_pred="))
    assert(parts.nonEmpty)
    val back = spark.read.parquet(tmp)
    assert(back.count() === prepared.count())
  }

  test("IVF top-k: exact recall when probing all cells, sane at fewer") {
    val emb = catalog.table("embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id"),
      col("embedding"), q, col("vec_id"), col("embedding"), k = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val allProbe = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 3, nlist = 8, nprobe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(allProbe === exact) // probing every cell == brute force
    val partial = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 3, nlist = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect partial).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF nprobe=3 recall $recall")
  }
}
