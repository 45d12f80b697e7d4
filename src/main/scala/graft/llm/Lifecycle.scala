package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Caller-facing release hook for the cached/checkpointed state some
  * operators in this package leave behind by design:
  *
  *  - [[SemDedup.duplicates]] persists its (id, vector, cell)
  *    assignment so the within-cell self-join reads one materialized
  *    frame instead of recomputing the featurize/assign chain per side;
  *  - [[KMeans.fit]] returns a localCheckpoint-backed centroid table
  *    (the checkpoint is what cuts the iterative lineage).
  *
  * Both are correct lifecycles for a single query, but a LONG-RUNNING
  * session that calls these repeatedly accumulates executor blocks
  * unless someone frees them. `Dataset.unpersist` alone is not enough:
  * it consults only the SQL cache manager and misses checkpoint RDDs.
  * [[release]] walks the frame's plan and frees BOTH kinds — call it
  * once the result has been materialized (written, collected) and is
  * no longer needed.
  */
object Lifecycle {

  /** Free every cache the given frame's plan is backed by: SQL-cached
    * subtrees (`persist`) are uncached through the session cache
    * manager (entry removed + blocks dropped), and checkpoint-backed
    * leaves (`localCheckpoint`) have their RDD blocks unpersisted.
    * No-op for frames that are backed by neither. After release the
    * frame is still VALID — persisted subtrees recompute from source
    * on the next action; checkpoint-backed frames do NOT (their
    * lineage was truncated), so release those only when done. */
  def release(df: DataFrame): Unit = {
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.withCachedData.foreach {
      case ir: InMemoryRelation =>
        session.sharedState.cacheManager.uncacheQuery(
          session, ir.cacheBuilder.logicalPlan, cascade = false)
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
