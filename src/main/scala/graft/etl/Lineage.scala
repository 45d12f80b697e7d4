package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ETL provenance lineage (SURVEY.md §2k T7): every document the pipeline
  * emits carries an `etl` struct chaining back to its raw source block —
  * the Spark analog of the reference's EtlHeadGenerator (public repo
  * `activedata_etl/transforms/__init__.py`).
  *
  * The struct is recursive in the reference (`source` nests the previous
  * stage's etl); here each stage wraps the previous struct one level
  * deeper, preserving the full chain as typed nested data.
  */
object Lineage {

  /** First-stage lineage head: id + source block + stage metadata. */
  def etlHead(id: Column, bucket: String, key: Column, etlType: String,
              timestamp: java.sql.Timestamp, revision: String): Column =
    struct(
      id.as("id"),
      struct(lit(bucket).as("bucket"), key.as("key")).as("source"),
      lit(etlType).as("type"),
      lit(timestamp).as("timestamp"),
      lit(revision).as("revision"))

  /** Wrap a subsequent stage around an existing etl chain. */
  def etlStage(id: Column, prev: Column, etlType: String,
               timestamp: java.sql.Timestamp, revision: String): Column =
    struct(
      id.as("id"),
      prev.as("source"),
      lit(etlType).as("type"),
      lit(timestamp).as("timestamp"),
      lit(revision).as("revision"))

  /** Attach a lineage head as the `etl` column. */
  def withEtl(df: DataFrame, id: Column, bucket: String, key: Column,
              etlType: String, timestamp: java.sql.Timestamp,
              revision: String): DataFrame =
    df.withColumn("etl", etlHead(id, bucket, key, etlType, timestamp,
      revision))
}
