package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-shuffle on the dedup key;
  *  - minhash signatures are row-local column math (higher-order
  *    functions over the shingle array) — ZERO shuffle and no driver
  *    state; the only exchange in the whole pipeline is the band join;
  *  - LSH banding turns the O(n²) pair space into an equi-join on
  *    (band index, band hash) — only same-bucket docs ever meet, and the
  *    band join is a plain shuffle join AQE can skew-split;
  *  - candidate pairs are exact-verified with Jaccard over shingle sets,
  *    so precision is 1.0 and recall is the standard LSH S-curve.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per key. Deterministic (unlike
    * dropDuplicates, whose survivor depends on partition order). */
  def exactByKey(df: DataFrame, key: Seq[Column], id: Column): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature column: array of `numHashes` minima of seeded
    * murmur3 hashes over the doc's shingle set. */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => hash(s, lit(i))))
    }: _*)

  /** Near-duplicate pairs via MinHash + LSH banding, exact-verified.
    *
    * @param df        input with an id and a text column
    * @param numHashes signature length (bands * rowsPerBand)
    * @param bands     LSH bands; rows/band = numHashes/bands controls the
    *                  similarity S-curve threshold (~ (1/bands)^(band/rows))
    * @param threshold exact-Jaccard floor for verified output pairs
    * @return (id_a, id_b, jaccard) with id_a < id_b, one row per pair
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .select(id.as("id"), TextAnalysis.shingles(text, shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // band hash = hash of the signature slice; explode to (band, bh, id)
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("sig")(b * rows + r)): _*))
      }: _*)).as(Seq("band", "bh")))
    // same (band, bh) bucket -> candidate pair (id_a < id_b)
    val left = banded.select(col("band"), col("bh"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("bh"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = left.join(right, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(null))
  }

  /** 64-bit SimHash of the token multiset: bit i is set when the sum of
    * (tokens whose murmur3 hash has bit i) exceeds half the tokens.
    * Near-dup <=> small Hamming distance. Pure column math. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val bits = (0 until 64).map { i =>
      val votes = size(filter(toks,
        t => shiftright(xxhash64(t), i).bitwiseAND(1) === 1))
      when(votes * 2 > n, lit(1L << i)).otherwise(lit(0L))
    }
    when(n > 0, bits.reduce(_.bitwiseOR(_))).otherwise(lit(null))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding near-duplicate pairs: cosine above threshold, via LSH
    * random-hyperplane buckets (see Similarity.lshBucket) + exact verify. */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column,
                     planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val withB = df.select(id.as("id"), vec.as("v"))
      .withColumn("bucket", Similarity.lshBucket(col("v"), planes))
    val l = withB.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"))
    val r = withB.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }
}
