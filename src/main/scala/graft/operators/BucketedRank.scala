package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global (or per-group) rank WITHOUT a single-task window — the
  * q212/q352 decomposition, published at the operator layer: rows
  * carry a bucket key that is an ORDER-RANGE of the sort axis (the
  * sort column itself when its value census is bounded, or the first
  * two hex chars of the md5 the sort orders by), the per-bucket row
  * census prefix-sums via a triangular self-join (≤ 256² rows per
  * group), and a per-(group, bucket) window adds the intra-bucket
  * row number. `order` must begin with the column(s) the bucket
  * ranges over so buckets stay order-ranges. Scales to any corpus:
  * no stage ever sees more than one bucket's rows in one task.
  *
  * (Implementation home of QueryShared.bucketedRank — the query
  * layer delegates here; BucketedRankSpec's laws apply verbatim.)
  */
object BucketedRank {

  def rank(df: DataFrame, part: Seq[String], bucket: String,
           order: Seq[String], rankName: String): DataFrame = {
    val keys = part :+ bucket
    val census = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bc"))
    val right = census.select(
      (part.map(n => col(n).as(s"__p_$n")) :+
        col(bucket).as("__b2") :+ col("__bc").as("__bc2")): _*)
    val cond = part.foldLeft(col("__b2") < col(bucket)) {
      (acc, n) => acc && (col(s"__p_$n") === col(n))
    }
    val offs = census.join(right, cond, "left")
      .groupBy(keys.map(col): _*)
      .agg(coalesce(sum(col("__bc2")), lit(0L)).as("__boff"))
    val iw = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
    df.join(offs, keys)
      .withColumn(rankName, col("__boff") + row_number().over(iw))
      .drop("__boff")
  }
}
