package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OFFLINE introspection of a streaming query's state store — Spark's
  * `state-metadata` / `statestore` data sources pointed at a
  * checkpoint location. The 100 TB operational story: when a
  * continuous curation stream misbehaves (state growing, one entity
  * hot, a key that should have expired still resident), the question
  * "what is IN the state store right now" must be answerable WITHOUT
  * stopping the stream or attaching a debugger — these readers parse
  * the checkpoint's own files, so an audit job runs beside the live
  * query with zero interference, and the result is a DataFrame every
  * operator in this library composes with (skew census over state
  * keys, fingerprint of state content, join against the entity dim).
  *
  * Correctness contract (proven by the oracled state-audit query):
  * the state rows read offline are EXACTLY the live keyed state — the
  * q253-style relational replay of the final per-key state must
  * hash-match what these readers return.
  */
object StateAudit {

  /** One row per stateful operator in the checkpoint: operatorId,
    * operatorName, stateStoreName, numPartitions, min/maxBatchId.
    * The discovery step — which operators exist and which batch range
    * is readable. */
  def metadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)

  /** State rows of one operator: `key` (the grouping key struct),
    * `value` (operator-specific state struct — for
    * map/flatMapGroupsWithState the user state under `groupState`),
    * `partition_id`. Defaults to the LATEST committed batch;
    * `batchId` time-travels to any batch still in the checkpoint —
    * the "what did state look like before the incident" read. */
  def store(spark: SparkSession, checkpoint: String,
            operatorId: Int = 0, batchId: Option[Long] = None,
            storeName: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("path", checkpoint)
      .option("operatorId", operatorId.toString)
    batchId.foreach(b => r = r.option("batchId", b.toString))
    storeName.foreach(s => r = r.option("storeName", s))
    r.load()
  }

  /** State rows of a NAMED transformWithState variable — the modern
    * arbitrary-state API (Spark 4.x) keeps each typed state variable
    * in its own column family, so offline reads are addressed by
    * `stateVarName` (the name passed to `getValueState`/etc. in the
    * processor), not by store name. The q94-flavor deployment path: a
    * new 100 TB stream runs transformWithState on RocksDB, and its
    * incident audit reads arrive through this method. */
  def storeVar(spark: SparkSession, checkpoint: String,
               stateVar: String, operatorId: Int = 0,
               batchId: Option[Long] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("path", checkpoint)
      .option("operatorId", operatorId.toString)
      .option("stateVarName", stateVar)
    batchId.foreach(b => r = r.option("batchId", b.toString))
    r.load()
  }

  /** Registered event-time timers of a transformWithState operator —
    * the expiry schedule, readable beside the state itself. */
  def timers(spark: SparkSession, checkpoint: String,
             operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpoint)
      .option("operatorId", operatorId.toString)
      .option("readRegisteredTimers", "true")
      .load()

  /** Per-partition state-row census for one operator — the state SKEW
    * audit: a partition holding far more than rows/numPartitions
    * means a hot key range, the precursor of the one-executor-dies
    * failure at scale. */
  def partitionCensus(spark: SparkSession, checkpoint: String,
                      operatorId: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions._
    store(spark, checkpoint, operatorId)
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n_state_rows"))
      .orderBy(col("partition_id"))
  }
}
