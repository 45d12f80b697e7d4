package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 / the 100 TB design notes): AQE's
  * skew-join split handles sort-merge joins at runtime, but aggregations
  * over heavy-hitter keys and broadcast-ineligible skewed joins still
  * need salting. These helpers make the two standard patterns one-liners
  * so pipelines don't hand-roll them.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) —
    * spreading a heavy key over `saltBuckets` reducers — then final-
    * aggregate on key. `partials` must be re-aggregatable (sum/count/
    * min/max style); pass the partial and final columns explicitly.
    *
    * {{{
    * Skew.saltedAgg(df, Seq(col("k")), 32,
    *   partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
    *   fin     = Seq(sum("s").as("s"), sum("c").as("c")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
                partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    salted
      .groupBy((keys :+ col("__salt")).toIndexedSeq: _*)
      .agg(partial.head, partial.tail.toIndexedSeq: _*)
      .groupBy(keys.toIndexedSeq: _*)
      .agg(fin.head, fin.tail.toIndexedSeq: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side
    * that cannot be broadcast: left rows get a random-ish salt in
    * [0, saltBuckets); the right side is replicated `saltBuckets` times,
    * so each (key, salt) shuffle bucket is balanced.
    * Equi-join on `key` only. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int, how: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), how)
      .drop("__salt")
  }
}
