package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation, composed from the graft
  * operators — the "a user of the reference could run their pipeline
  * here" surface. Each stage is a narrow, shuffle-minimal transform:
  *
  * {{{
  * raw documents
  *   -> language id + quality scoring        (projection, no shuffle)
  *   -> quality floor filter                 (pushable predicate)
  *   -> exact dedup on content fingerprint   (one hash shuffle)
  *   -> near-dup removal via MinHash LSH     (band equi-join)
  *   -> partitioned write by language        (rollover-style sink)
  * }}}
  */
object Pipelines {

  /** Score + filter + dedup a document frame. Returns the surviving
    * documents with `lang_pred`, `quality`, `fingerprint` columns.
    * `portableFingerprint` switches the exact-dedup key to the
    * md5-based [[TextAnalysis.fingerprintPortable]] so the stage is
    * differentially verifiable; the default stays the faster native
    * hash. */
  def prepareCorpus(docs: DataFrame, id: Column, text: Column,
                    minQuality: Double = 0.3,
                    nearDupJaccard: Double = 0.8,
                    portableFingerprint: Boolean = false): DataFrame = {
    val fp =
      if (portableFingerprint) TextAnalysis.fingerprintPortable(text)
      else TextAnalysis.fingerprint(text)
    val scored = TextAnalysis.withLangId(docs, text, "lang_pred")
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("fingerprint", fp)
      .filter(col("quality") >= minQuality)
    // exact dedup: identical fingerprint keeps lowest id. Persisted —
    // it feeds BOTH the near-dup pair mining and the final anti-join,
    // and recomputing it re-runs the whole scoring projection.
    val exact = Dedup.exactByKey(scored, Seq(col("fingerprint")), id)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // near-dup removal: drop the higher id of each verified pair
    val pairs = Dedup.minhashPairs(exact, id, text,
      threshold = nearDupJaccard)
    val losers = pairs.select(col("id_b").as("__loser")).distinct()
    exact.join(losers, id === col("__loser"), "left_anti")
  }

  /** Write the prepared corpus partitioned by predicted language —
    * downstream per-language training reads prune to one partition. */
  def writeByLanguage(prepared: DataFrame, path: String): Unit =
    prepared.write.mode("overwrite").partitionBy("lang_pred").parquet(path)
}
