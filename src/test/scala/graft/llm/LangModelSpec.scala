package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug")
  ).toDF("doc_id", "text")

  test("counts: unigrams and bigrams are frequency tables") {
    val u = LangModel.unigrams(train, $"text")
      .as[(String, Long)].collect().toMap
    assert(u("the") === 4L && u("sat") === 2L && u("cat") === 1L)
    val b = LangModel.bigrams(train, $"text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(b(("sat", "on")) === 2L)
    assert(b(("the", "cat")) === 1L)
  }

  test("scoreDocs: in-domain text outscores out-of-vocabulary text") {
    val test = Seq(
      (10L, "the cat sat on the rug"),   // in-domain
      (11L, "zqx wvu ptm kjh gfd azx")   // all-OOV
    ).toDF("doc_id", "text")
    val uni = LangModel.unigrams(train, $"text")
    val bi = LangModel.bigrams(train, $"text")
    val out = LangModel.scoreDocs(test, $"doc_id", $"text", uni, bi,
        lambda = 0.5, k = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(10L)._1 === 6L) // every token scored
    assert(out(11L)._1 === 6L) // OOV docs still score (smoothing)
    assert(out(10L)._2 > out(11L)._2,
      "in-domain text must have higher avg log-probability")
  }

  test("incremental merge == full retrain, exactly (count tables and " +
       "persisted-model roundtrip)") {
    import org.apache.spark.sql.functions._
    val hist = Seq((1L, "the cat sat on the mat"),
      (2L, "a cat ran")).toDF("doc_id", "text")
    val batch = Seq((3L, "the cat ran fast"),
      (4L, "mat the cat")).toDF("doc_id", "text")
    val full = hist.unionByName(batch)
    val dir = graft.Scratch.dir("graft_lm_merge").toString
    LangModel.writeModel(LangModel.unigrams(hist, $"text"),
      LangModel.bigrams(hist, $"text"), dir)
    val (u0, b0) = LangModel.readModel(spark, dir)
    val uniM = LangModel.mergeUnigrams(u0,
      LangModel.unigrams(batch, $"text"))
    val biM = LangModel.mergeBigrams(b0,
      LangModel.bigrams(batch, $"text"))
    val uniF = LangModel.unigrams(full, $"text")
    val biF = LangModel.bigrams(full, $"text")
    assert(uniM.exceptAll(uniF).isEmpty && uniF.exceptAll(uniM).isEmpty)
    assert(biM.exceptAll(biF).isEmpty && biF.exceptAll(biM).isEmpty)
    // and therefore identical scores
    val sM = LangModel.scoreDocs(full, $"doc_id", $"text", uniM, biM,
      lambda = 0.5, deterministicAvg = true)
    val sF = LangModel.scoreDocs(full, $"doc_id", $"text", uniF, biF,
      lambda = 0.5, deterministicAvg = true)
    assert(sM.exceptAll(sF).isEmpty && sF.exceptAll(sM).isEmpty)
  }

  test("hand-computed single-token doc: unigram-only backoff") {
    val test = Seq((20L, "the")).toDF("doc_id", "text")
    val uni = LangModel.unigrams(train, $"text")
    val bi = LangModel.bigrams(train, $"text")
    val got = LangModel.scoreDocs(test, $"doc_id", $"text", uni, bi)
      .select($"avg_logprob").as[Double].collect().head
    // N=12 train tokens, V=7 distinct (the cat sat on mat dog rug);
    // p(the) = (4+1)/(12+7) = 5/19
    assert(math.abs(got - math.log(5.0 / 19.0)) < 1e-12)
  }
}
