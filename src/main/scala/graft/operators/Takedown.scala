package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INCREMENTAL takedown execution over a packed corpus — the fold
  * twin of the one-shot hole-punch census (q408). The batch census
  * re-derives spans, fragments and digests from the corpus on every
  * takedown; at 100 TB that is a full-corpus scan per notice batch.
  * The production shape is a PACK-TIME manifest + an O(affected)
  * fold:
  *
  *  - at pack time (once, when the layout is written):
  *    [[fragmentIndex]] — the chunk-keyed (chunk, doc_id, fs, fe)
  *    fragment index; [[chunkDigests]] — per-chunk partial mod-sums
  *    of fragment identity hashes; and a one-row totals frame
  *    (chunk count, token total, corpus digest).
  *  - per notice batch: the notices' doc ids join the spans manifest
  *    (layout lookup, ∝ notices) and APPEND to a takedown manifest —
  *    text is never read, and re-delivered/overlapping notices fold
  *    to no-ops on the doc_id key.
  *  - [[foldCensus]] then answers the q408 census from the manifests
  *    alone: affected chunks come off the removed spans, the clean
  *    digest is TOTAL MINUS AFFECTED (partial mod-sums are
  *    subtractive — the whole point of the two-level digest), and
  *    the survivor/mask metadata is a chunk-pruned lookup into the
  *    fragment index. Every step after the pack-time build costs
  *    ∝ affected chunks + notices, never ∝ corpus.
  *
  * The pre/post clean digests take DIFFERENT paths here — pre
  * subtracts the pack-time chunk-digest manifest rows, post subtracts
  * freshly-hashed fragments from the index — so their q408-pinned
  * equality is a live integrity check of the manifest itself, not a
  * tautology. Exact integers end to end; PackingSpec pins the fold
  * laws, and q412's oracle is the q408 rebuild with the union of all
  * notice batches.
  */
object Takedown {

  /** Fragment identity hash — the first 7 md5 hex digits of
    * "frag:doc:fs:fe" as a long (< 2^28, so per-chunk sums of ≤ L+1
    * fragments stay far below overflow). Must stay in lockstep with
    * the q408/q412 oracles' rendering. */
  private def fragHash: Column =
    conv(substring(md5(concat(lit("frag:"),
        col("doc_id").cast("string"), lit(":"),
        col("fs").cast("string"), lit(":"),
        col("fe").cast("string")).cast("binary")), 1, 7),
      16, 10).cast("long")

  /** (chunk, doc_id, fs, fe): the pack-time fragment index. One row
    * per chunk a doc touches (≤ len/L + 1 explode), chunk-keyed so a
    * takedown's survivor lookup prunes to affected chunks. */
  def fragmentIndex(spans: DataFrame, chunkTokens: Long): DataFrame =
    spans.withColumn("chunk", explode(sequence(
        expr(s"s div $chunkTokens"),
        expr(s"e div $chunkTokens"))))
      .select(col("chunk"), col("doc_id"),
        greatest(col("s"), col("chunk") * chunkTokens).as("fs"),
        least(col("e"), (col("chunk") + 1) * chunkTokens - 1)
          .as("fe"))

  /** (chunk, digest, n_frags): per-chunk partial mod-sums of fragment
    * identity hashes — the subtractive digest manifest. */
  def chunkDigests(frIdx: DataFrame, mod: Long): DataFrame =
    frIdx.select(col("chunk"), col("doc_id"), col("fs"), col("fe"))
      .withColumn("__h", fragHash)
      .groupBy(col("chunk"))
      .agg(pmod(sum(col("__h")), lit(mod)).as("digest"),
        count(lit(1)).as("n_frags"))

  /** One-row pack-time totals: (n_chunks, total_tokens,
    * total_digest) — the scalars every later fold subtracts from. */
  def packTotals(spans: DataFrame, chDig: DataFrame, chunkTokens: Long,
                 mod: Long): DataFrame =
    spans.agg(
        coalesce(expr(s"max(e) div $chunkTokens") + 1, lit(0L))
          .cast("long").as("n_chunks"),
        coalesce(max(col("e")) + 1, lit(0L)).as("total_tokens"))
      .crossJoin(chDig.agg(
        coalesce(pmod(sum(col("digest")), lit(mod)), lit(0L))
          .as("total_digest")))

  /** The q408 takedown census computed from the pack-time manifests
    * and the folded removed-doc spans (`removed` must carry
    * (doc_id, n_tok, s, e) — notices joined onto the spans manifest,
    * deduplicated on doc_id). Output columns match q408 exactly so
    * the oracle is the one-shot rebuild SQL with the union of all
    * notice batches. */
  def foldCensus(removed: DataFrame, frIdx: DataFrame,
                 chDig: DataFrame, totals: DataFrame,
                 chunkTokens: Long, mod: Long): DataFrame = {
    val rm = removed.localCheckpoint() // ∝ notices; read three times
    val affected = rm.withColumn("chunk", explode(sequence(
        expr(s"s div $chunkTokens"),
        expr(s"e div $chunkTokens"))))
      .select(col("chunk")).distinct()
      .localCheckpoint() // ∝ affected; joined three times
    val nafc = affected.agg(count(lit(1)).as("n_affected"))
    val remRow = rm.agg(count(lit(1)).as("n_removed_docs"),
      coalesce(sum(col("n_tok")), lit(0L)).as("pad_tokens"),
      min(col("s")).as("__minrs"))
    // pre: subtract the MANIFEST's affected chunk digests
    val affDig = chDig.join(affected, Seq("chunk"))
      .agg(coalesce(pmod(sum(col("digest")), lit(mod)), lit(0L))
        .as("__ad"))
    // chunk-pruned fragment lookup: only affected chunks are read
    val affFr = frIdx.join(affected, Seq("chunk"))
      .localCheckpoint() // ∝ affected; digest + mask both read it
    // post: subtract freshly-hashed affected fragments — agreeing
    // with pre is the manifest-integrity check
    val affFrDig = affFr.withColumn("__h", fragHash)
      .groupBy(pmod(col("__h"), lit(1024L)).as("__sb"))
      .agg(pmod(sum(col("__h")), lit(mod)).as("__ps"))
      .agg(coalesce(pmod(sum(col("__ps")), lit(mod)), lit(0L))
        .as("__afd"))
    val mb = affFr
      .join(rm.select(col("doc_id"), lit(true).as("__rm")),
        Seq("doc_id"), "left")
      .filter(col("__rm").isNull)
      .groupBy(col("chunk")).agg(count(lit(1)).as("__ns"))
      .agg(coalesce(sum(col("__ns")), lit(0L))
          .as("n_surv_frags_affected"),
        coalesce(sum(greatest(col("__ns") - 1, lit(0L))), lit(0L))
          .as("boundaries_affected"))
    totals.crossJoin(broadcast(nafc))
      .withColumn("n_clean", col("n_chunks") - col("n_affected"))
      .crossJoin(broadcast(remRow))
      .crossJoin(broadcast(affDig))
      .crossJoin(broadcast(affFrDig))
      .crossJoin(broadcast(mb))
      .withColumn("clean_digest_pre",
        pmod(col("total_digest") - col("__ad"), lit(mod)))
      .withColumn("clean_digest_post",
        pmod(col("total_digest") - col("__afd"), lit(mod)))
      // repack alternative, in closed form off the manifest scalars:
      // survivors after the first hole are exactly the docs whose
      // span starts after min removed s, and contiguous packing
      // makes their token sum total - minrs - pad (PackingSpec law)
      .withColumn("n_chunks_repacked",
        expr(s"CASE WHEN total_tokens - pad_tokens > 0 THEN " +
          s"(total_tokens - pad_tokens - 1) div $chunkTokens + 1 " +
          "ELSE 0 END").cast("long"))
      .withColumn("tokens_moved",
        coalesce(col("total_tokens") - col("__minrs")
          - col("pad_tokens"), lit(0L)))
      .select(col("n_chunks"), col("n_affected"), col("n_clean"),
        col("n_removed_docs"), col("pad_tokens"),
        col("clean_digest_pre"), col("clean_digest_post"),
        col("n_surv_frags_affected"), col("boundaries_affected"),
        col("n_chunks_repacked"), col("tokens_moved"))
  }
}
