package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-query artifact staging: build an expensive intermediate ONCE
  * per parameter key, persist it as parquet, and serve every later
  * request in the same JVM from the file — the pattern q109 (IVF
  * index), q320 (span-index manifest), and the near-dup pair miners
  * hand-rolled individually, published as one auditable helper (r10
  * verdict ask #7).
  *
  * The staging root is deliberately NOT a [[graft.Scratch]] dir:
  * Verify and Bench call `Scratch.sweep()` after EVERY query, and
  * cross-query reuse is the whole point. The root is deleted by its
  * own JVM shutdown hook instead, so a full sweep still leaves /tmp
  * as it found it.
  *
  * Contract: `key` must encode EVERY parameter the artifact depends
  * on — including the input data directory — exactly like a
  * content-addressed manifest. At 100 TB this is the "never rebuild
  * what a sibling query already mined" discipline: the second
  * consumer of a pair set / fitted index / span manifest pays a
  * parquet scan, not a corpus re-mine.
  */
object Staged {
  @volatile private var rootDir: java.nio.file.Path = _

  private def root: java.nio.file.Path = synchronized {
    if (rootDir == null) {
      rootDir = java.nio.file.Files.createTempDirectory("graft_staged")
      val p = rootDir
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
        catch { case _: Throwable => () }))
    }
    rootDir
  }

  /** Filesystem-safe dir name for a key. The readable prefix is the
    * sanitized key; the suffix is an MD5 prefix of the RAW key so two
    * keys that sanitize identically ("a::b" vs "a__b") can never
    * share an artifact dir. */
  private def sanitize(key: String): String = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c
      else '_')
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"${safe.take(120)}_$h"
  }

  /** DataFrame-shaped artifact: build + persist on first request for
    * `key`, read-from-parquet on every request. The returned frame is
    * always the parquet read, so first and later callers get the
    * identical (materialized, re-scannable) plan shape. */
  def getOrBuild(spark: SparkSession, key: String)
                (build: => DataFrame): DataFrame = {
    val path = synchronized {
      val p = root.resolve(sanitize(key))
      if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
        build.write.mode("overwrite").parquet(p.toString)
      p
    }
    spark.read.parquet(path.toString)
  }

  /** Drop every staged artifact (the root survives for reuse).
    * For harnesses that MEASURE build cost (ScaleBench) — a staged
    * hit on repeat 2 would report the parquet-read wall as the
    * query's cost and hide the mining exponent. Production runs and
    * Verify/Bench never call this. */
  def clear(): Unit = synchronized {
    if (rootDir != null) {
      Option(rootDir.toFile.listFiles()).toSeq.flatten.foreach(f =>
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: Throwable => () })
    }
  }

  /** Path-shaped artifact (multi-file indexes with sidecars — the
    * q109 IVF shape): `buildTo(path)` must write the artifact under
    * the given directory and drop it atomically enough that a later
    * call can consume the path directly. Returns the artifact path;
    * builds only on the first request for `key`. */
  def getOrBuildPath(key: String)(buildTo: String => Unit): String =
    synchronized {
      val p = root.resolve(sanitize(key))
      val marker = p.resolve("_STAGED_DONE")
      if (!java.nio.file.Files.exists(marker)) {
        buildTo(p.toString)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(marker, Array.emptyByteArray)
      }
      p.toString
    }
}
