package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY.md §2a). The reference's sinks are S3 gzipped
  * JSON-lines blocks keyed by etl id (S2), time-rolled Elasticsearch
  * indexes with retention (S6 rollover), and a fan-out splitter (S7).
  * Spark-first re-expression:
  *
  *  - blocks -> parquet (columnar beats gzip JSON-lines at rest: codegen
  *    scans, pushdown, column pruning) with `partitionBy` as the block
  *    key, json-lines offered for interop;
  *  - rollover -> `partitionBy(date_col)`: writers append to the day's
  *    partition, readers prune by date — retention is dropping partition
  *    directories, and "too-old" docs are filtered at write;
  *  - split -> cache once, write N times (each sink sees identical data
  *    without recomputing the pipeline).
  */
object Sinks {

  /** S2: write as partitioned columnar blocks. */
  def writeBlocks(df: DataFrame, path: String, partitionCols: Seq[String],
                  format: String = "parquet"): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*)
      .format(format).save(path)

  /** S6: time-rolled sink — route rows to `date=YYYY-MM-DD` partitions,
    * dropping docs older than `retainDays` relative to `now`. */
  def writeRollover(df: DataFrame, path: String, ts: Column,
                    retainDays: Int, now: java.sql.Timestamp): Unit = {
    val cutoff = new java.sql.Timestamp(
      now.getTime - retainDays * 86400000L)
    df.filter(ts >= lit(cutoff))
      .withColumn("__date", date_format(ts, "yyyy-MM-dd"))
      .write.mode("append").partitionBy("__date").parquet(path)
  }

  /** S7: fan one computed frame out to several sinks, computing it once. */
  def split(df: DataFrame, sinks: Seq[DataFrame => Unit]): Unit = {
    val cached = df.persist()
    try sinks.foreach(_(cached))
    finally cached.unpersist()
  }
}
