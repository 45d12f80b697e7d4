package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL registration: graft functions callable from spark.sql") {
    graft.functions.register(spark)
    val row = spark.sql(
      """SELECT graft_simhash64('the quick brown fox') AS h,
                size(graft_token_hashes('a b c')) AS n,
                graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c
      """).collect().head
    assert(!row.isNullAt(0))
    assert(row.getInt(1) === 3)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
  }

  test("extensions class registers every function without error") {
    // unit-level: the injector runs against a fresh extensions holder
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    assert(GraftExtensions.all.map(_._1).distinct.size ===
      GraftExtensions.all.size)
  }

  test("native and SQL forms agree") {
    graft.functions.register(spark)
    val df = Seq("one two three four five").toDF("t")
    val viaCol = df.select(simhash64($"t")).collect().head.getLong(0)
    df.createOrReplaceTempView("fn_t")
    val viaSql = spark.sql("SELECT graft_simhash64(t) FROM fn_t")
      .collect().head.getLong(0)
    assert(viaCol === viaSql)
  }

  test("codegen and interpreted paths agree (nullSafeEval vs doGenCode)") {
    val df = Seq(("alpha beta gamma", "alpha beta delta")).toDF("a", "b")
    // interpreted: direct expression eval on a literal child
    val interpreted = ShingleHashes(
        org.apache.spark.sql.catalyst.expressions.Literal("alpha beta gamma"),
        2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaPlan = df.select(shingle_hashes($"a", 2)).collect()
      .head.getSeq[Long](0)
    assert(interpreted === viaPlan)
  }
}
