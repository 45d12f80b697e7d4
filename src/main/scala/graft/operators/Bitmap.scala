package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-packed membership bitmaps over integer member ids — the
  * audience-overlap / segment-intersection primitive. A (set, member)
  * relation becomes one row per (set, 64-member word) holding a
  * 64-bit mask; set algebra (intersection/union cardinalities across
  * segments) then runs as word-aligned equi-joins + `&`/`|` +
  * popcount, never touching the member-grain rows again.
  *
  * Scale shape: the bitmap build is ONE (set, word)-keyed aggregation
  * over the membership relation — `bit_or` is idempotent, so no
  * distinct pass is needed and map-side partial aggregation absorbs
  * duplicate memberships before the shuffle. The overlap matrix joins
  * word frames on `word` alone: each word row meets only the other
  * sets' SAME word (≤ |sets| rows), so the join volume is
  * |sets|²·(members/64) instead of the member-grain |sets|²·members
  * a distinct-pair self-join would cost — the 64× packing IS the
  * bandwidth win, and every operation stays exact-integer
  * (deterministic, oracle-comparable unrounded). Dense-id domains
  * pack best; sparse/skewed id spaces should be rank-compacted first
  * (any stable dense re-keying works — the bitmap is agnostic).
  *
  * All arithmetic assumes NON-NEGATIVE member ids (`div`/`%` are
  * floor semantics only for n ≥ 0; a word's bit 63 may set the sign
  * bit of the Long — `bit_or`/`&`/`bit_count` are sign-agnostic). */
object Bitmap {

  /** (set `s`, word, bits): 64-bit membership words per set. */
  def bitmapWords(rel: DataFrame, set: Column, member: Column)
      : DataFrame =
    rel.select(set.as("s"), member.as("m"))
      .select(col("s"), expr("m div 64").as("word"),
        expr("shiftleft(1L, cast(m % 64 as int))").as("bit"))
      .groupBy(col("s"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))

  /** Pairwise overlap of a [[bitmapWords]] frame: for every set pair
    * sa < sb sharing at least one word, the EXACT distinct-member
    * counts (n_a, n_b, n_common) — Jaccard etc. are exact integer
    * ratios on top. */
  def overlap(words: DataFrame): DataFrame = {
    val tot = words.groupBy(col("s"))
      .agg(sum(expr("bit_count(bits)")).as("n"))
    val a = words.select(col("s").as("sa"), col("word"),
      col("bits").as("ba"))
    val b = words.select(col("s").as("sb"), col("word"),
      col("bits").as("bb"))
    a.join(b, Seq("word")).filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(expr("bit_count(ba & bb)")).as("n_common"))
      .join(tot.select(col("s").as("sa"), col("n").as("n_a")), Seq("sa"))
      .join(tot.select(col("s").as("sb"), col("n").as("n_b")), Seq("sb"))
      .select(col("sa"), col("sb"), col("n_a"), col("n_b"),
        col("n_common"))
  }
}
