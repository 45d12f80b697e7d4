package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Training-corpus layout operators: the deterministic global shuffle
  * that fixed-size training shards need, and hash-based negative
  * sampling for contrastive-pair construction. Both are pure
  * functions of ids (md5, no RNG, no row order), so outputs never
  * move under re-partitioning, re-runs, or engine changes — the
  * property a reproducible training run requires — and both avoid
  * the one-task global sort/window a naive "ORDER BY random()" or
  * corpus-wide row_number would cost.
  *
  * Portability contract (the q77 idiom): Spark `md5(cast(s as
  * binary))` ≡ DuckDB `md5(s::varchar)`; hex-prefix → integer via
  * `conv(hex, 16, 10)` ≡ `CAST('0x' || hex AS INTEGER)`. */
object Sharding {

  private def h(id: Column, seed: String): Column =
    md5(concat(lit(seed + ":"), id.cast("string")).cast(BinaryType))

  /** Deterministic global shuffle + fixed-size shard assignment:
    * every row gets its global rank `rn` under the order
    * (md5(seed:id), id) and lands in shard `(rn-1) div shardSize` —
    * size-balanced shards in a reproducible pseudo-random order,
    * WITHOUT a global window: rows hash into 256 prefix buckets
    * (the first 2 hex chars of the sort key — buckets are RANGES of
    * the sort order, so bucket order + intra-bucket order = global
    * order); the 256-row bucket census is prefix-summed with a tiny
    * triangular join, and each row's rank is its bucket's offset
    * plus an intra-bucket row_number (windows partitioned by bucket,
    * each ≈ N/256 rows). Two shuffles total (census agg + bucket
    * window), both keyed — the shape that survives a 100 TB corpus,
    * where a single-task ORDER BY row_number would not. */
  def globalShuffleShards(df: DataFrame, id: Column, seed: String,
                          shardSize: Long): DataFrame = {
    require(shardSize >= 1, "shardSize must be >= 1")
    val base = df.select(id.as("id"))
      .withColumn("h", h(col("id"), seed))
      .withColumn("__bucket", substring(col("h"), 1, 2))
    val census = base.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
    // prefix offsets over 256 census rows: triangular join, not a
    // partition-less window (the audit's "one task sorts everything"
    // anti-shape — harmless at 256 rows, but the join states the
    // bound structurally)
    val offsets = census.select(col("__bucket"), col("__cnt"))
      .join(census.select(col("__bucket").as("__b2"),
          col("__cnt").as("__c2")),
        col("__b2") < col("__bucket"), "left")
      .groupBy(col("__bucket"))
      .agg(coalesce(sum(col("__c2")), lit(0L)).as("__off"))
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("h"), col("id"))
    base.join(offsets, Seq("__bucket"))
      .withColumn("rn", col("__off") + row_number().over(w))
      .withColumn("shard", expr(s"(rn - 1) div $shardSize"))
      .select(col("id"), col("h"), col("rn"), col("shard"))
  }

  /** `k` deterministic pseudo-random negatives per query id from a
    * candidate pool, by bucket-representative hashing: pool members
    * hash into `buckets` buckets, each bucket is represented by its
    * min-(md5, id) member, and query q's i-th negative is the
    * representative of bucket md5(seed:q:i) mod buckets. The pool is
    * never globally ranked (no corpus-wide window — the pool-side
    * cost is ONE bucket-keyed arg-min aggregation, the query side a
    * k-fold explode + an equi-join against the `buckets`-row
    * representative table, which AQE broadcasts). Collisions of a
    * query with its own negative are dropped (filter, mirrored in
    * any oracle); empty buckets (rare when buckets ≪ |pool|) simply
    * yield no row. Sampling is with-replacement across i (two i's
    * can hash to the same bucket). */
  def negativeSamples(queries: DataFrame, qid: Column,
                      pool: DataFrame, pid: Column,
                      k: Int, buckets: Int, seed: String): DataFrame = {
    require(k >= 1 && buckets >= 1, "k and buckets must be >= 1")
    val p = pool.select(pid.as("neg_id"))
      .withColumn("__ph", h(col("neg_id"), seed + ":p"))
      .withColumn("__bucket",
        pmod(conv(substring(col("__ph"), 1, 4), 16, 10).cast("int"),
          lit(buckets)))
    val reps = p.groupBy(col("__bucket"))
      .agg(min_by(col("neg_id"), col("__ph")).as("neg_id"))
    queries.select(qid.as("qid"))
      .withColumn("i", explode(expr(s"sequence(1, $k)")))
      .withColumn("__bucket",
        pmod(conv(substring(md5(concat(lit(seed + ":q:"),
            col("qid").cast("string"), lit(":"),
            col("i").cast("string")).cast(BinaryType)), 1, 4), 16, 10)
          .cast("int"), lit(buckets)))
      .join(reps, Seq("__bucket"))
      .filter(col("qid") =!= col("neg_id"))
      .select(col("qid"), col("i"), col("neg_id"))
  }
}
