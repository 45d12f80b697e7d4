package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table resolver over a directory of parquet files — the Spark analog of
  * the reference's container/namespace (public repo `vendor/jx_base/
  * container.py`, `snowflake.py`; SURVEY.md §2 data model).
  *
  * Snowflake semantics: `table("task.artifacts")` — a dot-path whose prefix
  * is a base table and whose suffix digs into nested array-of-struct
  * columns — yields the EXPLODED nested level (one row per array element),
  * like JX `from: "task.artifacts"`. Parent scalar columns are retained
  * (prefixed) so nested queries can still reference ancestors.
  */
final class Catalog(spark: SparkSession, dir: String) {
  import org.apache.spark.sql.types._

  private val cache = scala.collection.mutable.Map[String, DataFrame]()
  private val sessionCache = Catalog.resolvedFor(spark)

  /** Formats a table file/dir may use (S1: the reference reads JSON-lines
    * blocks; parquet is the columnar at-rest form we prefer). */
  private val Extensions = Seq(".parquet", ".orc", ".json", ".jsonl", ".csv")

  def baseTables: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .flatMap(f => Extensions.find(f.getName.endsWith)
        .map(ext => f.getName.stripSuffix(ext)))
      .distinct.sorted.toSeq
  }

  private def pathOf(base: String): String = {
    val d = new java.io.File(dir)
    Extensions.map(ext => new java.io.File(d, base + ext))
      .find(_.exists())
      .map(_.getAbsolutePath)
      .getOrElse(s"$dir/$base.parquet")
  }

  /** Register an in-session DataFrame as a queryable VIRTUAL table:
    * the JX service/runner path then resolves `name` to this frame
    * like any base table — the hook that exposes operator OUTPUT
    * frames (quality-classifier scores, SemDedup survivors, any
    * pipeline stage) to ad-hoc JX queries without materializing them
    * to parquet first. Dot-path nesting applies to base tables only;
    * a registered name is resolved whole. Registered views are
    * visible to `meta.columns` / `meta.tables` introspection with a
    * `virtual` marker (MetaColumns). */
  def register(name: String, df: DataFrame): Unit = {
    registered += name
    cache.put(name, df)
  }

  private val registered = scala.collection.mutable.LinkedHashSet[String]()

  /** Names registered via [[register]], in registration order —
    * distinct from base tables resolved into the same cache. */
  def registeredViews: Seq[String] = registered.toSeq

  def table(name: String): DataFrame = cache.getOrElseUpdate(name, {
    // virtual metadata tables, queryable like any other (JX
    // `from: "meta.columns"` — SURVEY.md §2 dynamic schema); they
    // reflect THIS instance's registered views, so never the shared
    // session cache
    if (name == "meta.columns")
      return graft.meta.MetaColumns.table(spark, this)
    if (name == "meta.tables")
      return graft.meta.MetaColumns.tables(spark, this)
    // BASE-table resolution is shared SESSION-wide (guide §6: file
    // listing / footer reads are driver-side, single-threaded work):
    // resolving a table costs a directory listing + TWO parquet
    // footer opens (nano-timestamp detection + schema inference) +
    // an InMemoryFileIndex build — ~0.13 s per call, and a 414-query
    // sweep re-resolves the same handful of static files thousands
    // of times. The cache holds the LAZY plan (file paths + schema),
    // never data: every action still scans parquet. Registered
    // views stay per-instance (the getOrElseUpdate above); a fresh
    // data dir is a fresh key, so tests writing their own tmp dirs
    // are unaffected.
    sessionCache.computeIfAbsent(s"$dir $name", _ => {
      val parts = name.split('.').toList
      // longest prefix that is a base table
      val baseNames = baseTables.toSet
      val (base, nested) = (1 to parts.length).reverse
        .map(i => (parts.take(i).mkString("."), parts.drop(i)))
        .find { case (b, _) => baseNames.contains(b) }
        .getOrElse(throw new IllegalArgumentException(
          s"unknown table: $name (have: ${baseTables.mkString(", ")})"))
      val path = pathOf(base)
      val df =
        if (path.endsWith(".json") || path.endsWith(".jsonl"))
          spark.read.json(path) // schema inferred from data (JSON-lines S1)
        else if (path.endsWith(".csv"))
          spark.read.option("header", "true").option("inferSchema", "true")
            .csv(path)
        else if (path.endsWith(".orc")) spark.read.orc(path)
        else readParquet(path)
      nested.foldLeft(df)(explodeLevel)
    })
  })

  /** Read parquet, transparently handling TIMESTAMP(NANOS) columns (which
    * Spark's vectorized reader rejects): such columns are read as long
    * nanos via the legacy flag and converted to TimestampType (micros).
    * Column detection is from the parquet footer — no per-table
    * hardcoding, works for any source file. */
  private def readParquet(path: String): DataFrame = {
    val nanos = nanoTimestampCols(path)
    if (nanos.isEmpty) spark.read.parquet(path)
    else {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      nanos.foldLeft(raw) { (d, c) =>
        // integer `div`, not `/`: long / long is DOUBLE division in Spark
        // and rounds the microsecond (53-bit mantissa) — truncation must
        // match the engines that read the nanos natively.
        // NOTE: `div` truncates toward zero, which equals floor division
        // only for POST-EPOCH timestamps; pre-1970 nanos would round up
        // one microsecond vs a native nanos reader (use a pmod-adjusted
        // floordiv if pre-epoch data ever enters scope)
        d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      }
    }
  }

  /** Names of top-level TIMESTAMP(NANOS) columns per the parquet footer. */
  private def nanoTimestampCols(path: String): Seq[String] = {
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val f = new java.io.File(path)
    val file =
      if (f.isDirectory)
        f.listFiles().find(_.getName.endsWith(".parquet"))
          .getOrElse(return Nil)
      else f
    val conf = spark.sessionState.newHadoopConf()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
        case field if Option(field.getLogicalTypeAnnotation).exists {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == TimeUnit.NANOS
          case _ => false
        } => field.getName
      }.toSeq
    } finally reader.close()
  }

  /** Resolved plans are invalidated when a base table's FILE SET or
    * mtime changes (a sink overwriting a dir it later re-reads):
    * callers that rewrite a table under a live Catalog call this. */
  def invalidate(name: String): Unit = {
    cache.remove(name)
    sessionCache.remove(s"$dir $name")
  }

  /** Explode one nested array-of-struct level, keeping parent scalars. */
  private def explodeLevel(df: DataFrame, field: String): DataFrame = {
    val keep = df.schema.fields.filterNot(_.name == field)
      .map(f => col(f.name))
    val exploded = df.select((keep :+ explode(col(field)).as("__n"))
      .toIndexedSeq: _*)
    val childCols = exploded.schema.fields.last.dataType match {
      case s: StructType => s.fieldNames.map(n => col(s"__n.$n").as(n)).toSeq
      case _             => Seq(col("__n").as(field))
    }
    exploded.select((keep.toSeq ++ childCols).toIndexedSeq: _*)
  }
}

object Catalog {
  /** Session-wide resolved-plan cache, keyed "(dir) (name)" inside a
    * weak per-session map (a stopped session's plans must be GC-able
    * — a DataFrame pins its SparkSession). Shared across Catalog
    * INSTANCES because every query helper constructs a fresh Catalog:
    * the instance-local cache alone made each `tbl()` call re-pay
    * resolution. */
  private val perSession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private[tables] def resolvedFor(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, DataFrame] =
    perSession.synchronized {
      var m = perSession.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        perSession.put(spark, m)
      }
      m
    }
}
