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

  /** Compaction — the operational answer to the small-files problem
    * every appending sink (micro-batch streams, per-block writers)
    * accumulates: rewrite a parquet directory into
    * ceil(rows / targetRowsPerFile) files and atomically swap it in
    * (write to `<path>.__compact`, move the old dir aside, rename —
    * the window without a live dir is two renames). Content is
    * UNCHANGED — that is the oracled invariant (q128 reads the
    * compacted table back against the original's oracle) — only the
    * file layout changes: fewer, larger files mean fewer scan tasks,
    * fewer open/seek round-trips, and healthier row-group sizes at
    * 100 TB. Returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetRowsPerFile: Long): (Int, Int) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def parquetFiles(p: String): Int = {
      val d = Paths.get(p)
      if (!Files.isDirectory(d)) 0
      else Files.list(d).filter(f =>
        f.toString.endsWith(".parquet")).count().toInt
    }
    val before = parquetFiles(path)
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1)
      / targetRowsPerFile).toInt
    val tmp = path + ".__compact"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    val old = path + ".__old"
    Files.move(Paths.get(path), Paths.get(old),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path),
      StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(old))
    (before, parquetFiles(path))
  }

  /** Copy-on-write DELETE by key — the right-to-be-forgotten /
    * retention-enforcement primitive: remove every row whose `keyCol`
    * appears in `victims` by REWRITING ONLY THE FILES THAT CONTAIN A
    * VICTIM. `_metadata.file_path` locates the hit files with one
    * victim-broadcast semi-join (footer-driven scan of the key column
    * only, row groups pruned by parquet min/max stats where the layout
    * allows — [[graft.operators.ZOrder]] writes exactly that layout);
    * untouched files are never read in full, never rewritten. At
    * 100 TB with clustered keys, deleting a user costs a handful of
    * file rewrites, not a table rewrite.
    *
    * The swap (write rewritten files to a scratch dir, unlink the hit
    * files, move the replacements in under fresh names) has a brief
    * non-transactional window — a production lakehouse closes it with
    * a manifest/snapshot commit (Iceberg/Delta-style), which is
    * metadata-layer machinery out of this engine's scope; the content
    * invariant itself is oracled end-to-end (q136).
    * Returns (filesRewritten, rowsDeleted). */
  def deleteByKey(spark: org.apache.spark.sql.SparkSession, path: String,
                  keyCol: String, victims: DataFrame): (Int, Long) = {
    import java.nio.file.{Files, Paths}
    val vict = victims.select(col(keyCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t = spark.read.parquet(path)
        .withColumn("__file", col("_metadata.file_path"))
      val hits = t.join(broadcast(vict), Seq(keyCol), "left_semi")
      val hitFiles = hits.select(col("__file")).distinct()
        .collect().map(_.getString(0)).sorted
      if (hitFiles.isEmpty) (0, 0L)
      else {
        val deleted = hits.count()
        val survivors = spark.read
          .parquet(hitFiles.toIndexedSeq: _*)
          .join(broadcast(vict), Seq(keyCol), "left_anti")
        val tmp = path + ".__cow"
        survivors.write.mode("overwrite").parquet(tmp)
        hitFiles.foreach(u => Files.delete(Paths.get(new java.net.URI(u))))
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
          .forEach { f =>
            Files.move(f,
              Paths.get(path, s"cow-$stamp-${f.getFileName.toString}"))
          }
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(tmp))
        (hitFiles.length, deleted)
      }
    } finally { vict.unpersist(); () }
  }
}
