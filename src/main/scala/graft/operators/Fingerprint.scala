package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content addressing for tables: an ORDER-INDEPENDENT fingerprint of
  * a keyed row set, so "are these two table snapshots identical" /
  * "which partitions changed since yesterday" costs one aggregation
  * instead of a row-level diff. The 100 TB use: fingerprint every
  * partition at write time, compare manifests at read time, and only
  * row-diff (cf. [[Reconcile.columnDiffCensus]]) the partitions whose
  * fingerprints moved.
  *
  * Construction (portable, exact): md5 over an INJECTIVE canonical
  * row rendering → first 8 hex chars as a 32-bit integer → modular
  * SUM over the group, mod 2³¹−1. Addition commutes, so the
  * fingerprint is invariant under row order and partitioning — a
  * map-side-combinable aggregate, one narrow exchange on the group
  * key, replayable bit-for-bit in any engine with md5. (A content
  * SUM, not a hash chain: chains need an order; sums don't.)
  *
  * The rendering is length-prefixed, not separator-joined: each cell
  * becomes `N` for NULL or `<utf8-byte-length>:<value>`, and cells
  * concatenate with no separator. A value rendering always starts
  * with a digit, so `N` can never collide with one, and the length
  * prefix makes the concatenation parse unambiguously — distinct
  * rows like ('a|b','c') vs ('a','b|c'), or (NULL,'x') vs ('x',NULL),
  * get distinct renderings. (A change-detection fingerprint that can
  * confuse two different snapshots is worse than none; a '|' join
  * does exactly that, and silently drops NULL cells besides.)
  *
  * Collision contract: the fingerprint is 31 bits, so two DIFFERENT
  * group contents compare equal with probability ≈ 2⁻³¹ per group
  * comparison (~0.5 per billion) — negligible for change-detection at
  * partition grain (a false "unchanged" costs one skipped re-diff of
  * one partition, caught on its next change), but NOT audit-grade
  * equality evidence. Anything composing this into a user-facing
  * equal/unequal verdict (e.g. the q300 manifest health report)
  * inherits that rate; if audit-grade certainty is ever needed, widen
  * to two independent 32-bit sums (e.g. md5 chars 1-8 and 9-16),
  * which squares the rate to ≈ 2⁻⁶².
  */
object Fingerprint {

  private val M = 2147483647L // 2^31 - 1

  /** Injective rendering of one cell: `N` for NULL, else
    * `<octet_length>:<string value>`. */
  private def cell(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("N"))
      .otherwise(concat(octet_length(s).cast("string"), lit(":"), s))
  }

  /** 32-bit content hash of one row's injective rendering. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat(cols.map(cell): _*)
      .cast(org.apache.spark.sql.types.BinaryType)), 1, 8), 16, 10)
      .cast("long")

  /** Per-group (n_rows, fp): modular content sum over [[rowHash]].
    * Terms are < 2³¹, so the un-reduced sum stays exact in a long up
    * to ~4·10⁹ rows per group; partition-grain groups hold far less. */
  def contentFingerprint(df: DataFrame, group: Column,
                         cols: Seq[Column]): DataFrame =
    df.select(group.as("grp"), pmod(rowHash(cols), lit(M)).as("__h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__h")), lit(M)).as("fp"))

  /** Merge two fingerprint manifests: disjoint row sets compose
    * ADDITIVELY ((fp₁+fp₂) mod M), which is what makes the scheme
    * incremental — fingerprint only the new partition, fold it into
    * the manifest, never re-scan history. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("grp"), col("n_rows").as("__n1"), col("fp").as("__f1"))
      .join(b.select(col("grp"), col("n_rows").as("__n2"),
        col("fp").as("__f2")), Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("__n1"), lit(0L)) + coalesce(col("__n2"), lit(0L)))
          .as("n_rows"),
        pmod(coalesce(col("__f1"), lit(0L)) +
          coalesce(col("__f2"), lit(0L)), lit(M)).as("fp"))
}
