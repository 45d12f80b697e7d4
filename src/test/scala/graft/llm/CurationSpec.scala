package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup equals the window formulation, ties on smaller id") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map(i =>
      (i, s"g${i % 5}", (rnd.nextInt(20) / 10.0)))
    val df = rows.toDF("id", "grp", "score")
    val got = Curation.topKPerGroup(df, $"grp", $"id", $"score", k = 4)
      .select("grp", "rk", "id", "score")
      .as[(String, Int, Long, Double)].collect().toSet
    // reference: window row_number
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".desc, $"id".asc)
    val exp = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 4)
      .select($"grp", $"rk".cast("int"), $"id", $"score")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got === exp)
  }

  test("topKPerGroup: groups smaller than k return all members ranked") {
    val df = Seq((1L, "a", 0.9), (2L, "a", 0.5), (3L, "b", 0.7))
      .toDF("id", "grp", "score")
    val got = Curation.topKPerGroup(df, $"grp", $"id", $"score", k = 5)
      .select("grp", "rk", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 3L)))
  }

  test("noveltyScores: exact copies score 0, unique prose scores 1, " +
       "hashed and string gram paths agree") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // copy of 1
      (3L, "completely different words about distributed query engines"))
      .toDF("doc_id", "text")
    val m = Curation.noveltyScores(docs, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_unique"), r.getAs[Double]("novelty"))).toMap
    assert(m(1) === ((0L, 0.0)), "every gram of doc 1 also in doc 2")
    assert(m(2) === ((0L, 0.0)))
    assert(m(3)._2 === 1.0, "doc 3 shares no gram")
    val str = Curation.noveltyScores(docs, $"doc_id", $"text",
      hashedShingles = false)
    assert(Curation.noveltyScores(docs, $"doc_id", $"text")
      .exceptAll(str).isEmpty && str.exceptAll(
        Curation.noveltyScores(docs, $"doc_id", $"text")).isEmpty)
  }

  test("partial aggregation present: plan has two aggregate stages") {
    val df = Seq((1L, "a", 0.9)).toDF("id", "grp", "score")
    val p = Curation.topKPerGroup(df, $"grp", $"id", $"score", k = 2)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial + final = bounded map-side combine
    assert(p.sliding("Aggregate".length).count(_ == "Aggregate") >= 2, p)
  }
}
