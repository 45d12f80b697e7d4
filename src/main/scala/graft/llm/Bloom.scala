package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Broadcast Bloom-filter prefilters for LARGE-large joins — the case
  * [[Contamination]]'s broadcast of exact eval grams cannot cover: both
  * sides too big to broadcast as rows, so the naive plan shuffles the
  * full 100 TB side on the join key. A Bloom sketch of the smaller
  * side's keys IS broadcastable (megabytes at fpp=1%, independent of
  * row width), and filtering the big side with it BEFORE the shuffle
  * drops ~(1-fpp) of the non-matching rows from the exchange.
  *
  * Exactness: Bloom filters have NO false negatives, so
  * prefilter-then-exact-join ≡ exact-join — the operator's result is
  * differentially verifiable against the plain join; only the byte
  * volume through the shuffle changes. (This is the same mechanism as
  * Spark's own runtime row-level filtering — InjectRuntimeFilter —
  * applied deliberately, at operator level, where the optimizer's
  * size heuristics cannot see that a corpus-overlap join qualifies.)
  *
  * Built on Spark's codegen'd sketch expressions
  * (BloomFilterAggregate / BloomFilterMightContain): the sketch is
  * merged executor-side as an ordinary partial aggregate — only the
  * final serialized bitmap reaches the driver — and the membership
  * probe compiles into the scan-side filter, so the prefilter rides
  * whole-stage codegen next to the parquet reader.
  */
object Bloom {

  private def toExpr(c: Column) =
    org.apache.spark.sql.graft.bridge.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.bridge.column(e)

  /** Optimal bit count for `n` items at false-positive rate `fpp`:
    * m = -n·ln(fpp)/ln(2)², floored to ≥ 64. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Distributed Bloom sketch of `key`: builds per-partition sketches
    * executor-side, merges them in the partial-aggregate tree, and
    * returns ONLY the serialized bitmap (the rows never leave the
    * executors). Keys are hashed to longs with xxhash64 — callers
    * probe with [[mightContain]] on the same key expression.
    *
    * Sizing envelope at scale: the bitmap is ~1.2·n·ln(1/fpp)/ln²2
    * bits — 100 M keys at fpp=0.01 is ~120 MB, comfortably
    * broadcastable; beyond ~1 B keys either relax fpp (the exact
    * confirm join absorbs false positives) or shard the sketch by a
    * key prefix. Spark guards the aggregate with
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4 M / 67 M) — raise those session confs
    * for larger builds; the error is immediate and names the limit. */
  def sketchBytes(df: DataFrame, key: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(toExpr(xxhash64(key)),
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    df.select(toCol(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a serialized sketch (possible false
    * positives at the configured fpp, never false negatives). The
    * sketch rides the plan as a binary literal; the probe is a
    * codegen'd predicate, pushable below exchanges like any filter. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    toCol(BloomFilterMightContain(Literal(sketch, BinaryType),
      toExpr(xxhash64(key))))

  /** Exact left-semi join of `big` against `small`'s keys with a
    * broadcast-Bloom prefilter on the big side: result rows are
    * IDENTICAL to `big.join(small.distinct, key, "left_semi")` (no
    * false negatives), but the big side is filtered to matches +
    * fpp·non-matches BEFORE its shuffle. Use when `small` is far too
    * large to broadcast as rows but its key sketch is not — the
    * corpus-vs-corpus overlap/decontamination shape.
    *
    * `expectedItems` sizes the sketch (pass the small side's
    * approximate distinct-key count; overshooting only costs bits). */
  def prefilteredSemiJoin(big: DataFrame, bigKey: Column,
                          small: DataFrame, smallKey: Column,
                          expectedItems: Long,
                          fpp: Double = 0.01): DataFrame = {
    val keys = small.select(smallKey.as("__bloom_key")).distinct()
    val bf = sketchBytes(keys, col("__bloom_key"), expectedItems, fpp)
    big.filter(mightContain(bf, bigKey))
      .join(keys, bigKey === col("__bloom_key"), "left_semi")
  }

  /** [[prefilteredSemiJoin]] dual: exact anti join (decontamination —
    * keep big rows whose key does NOT appear in `small`). The Bloom
    * filter cannot pre-DROP rows here (a false positive would wrongly
    * discard a clean row), so the sketch instead short-circuits the
    * shuffle for the ~(1-fpp) of rows it proves absent: provably-clean
    * rows bypass the join entirely and union back in; only possible
    * matches shuffle. */
  def prefilteredAntiJoin(big: DataFrame, bigKey: Column,
                          small: DataFrame, smallKey: Column,
                          expectedItems: Long,
                          fpp: Double = 0.01): DataFrame = {
    val keys = small.select(smallKey.as("__bloom_key")).distinct()
    val bf = sketchBytes(keys, col("__bloom_key"), expectedItems, fpp)
    val maybe = big.filter(mightContain(bf, bigKey))
      .join(keys, bigKey === col("__bloom_key"), "left_anti")
    val provablyClean = big.filter(!mightContain(bf, bigKey))
    provablyClean.unionByName(maybe)
  }
}
