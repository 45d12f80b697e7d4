package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: tables bucketed on the join key
  * join WITHOUT an Exchange on either side (SURVEY.md "partitioning &
  * shuffle" — the co-located-join strategy for repeated 100 TB joins
  * on the same key). */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val li = catalog.table("lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = catalog.table("orders")
      .select("o_orderkey", "o_orderstatus")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // in-memory catalog: a previous JVM's managed-table dirs survive the
    // metastore, so clear the locations too
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("b_lineitem", "b_orders").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // correctness: equals the unbucketed join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-6)
    }

    // scale property: the join itself required no shuffle of either side
    // (the only Exchange in the plan is the post-join aggregation's)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
           !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
  }
}
