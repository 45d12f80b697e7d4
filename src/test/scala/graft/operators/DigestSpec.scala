package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DigestSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range) =
    ids.map(i => (i.toLong, s"doc number $i body " + ("x" * (i % 7))))
      .toDF("doc_id", "text")

  test("fold law: digest(A ∪ B) == fold(digest(A), digest(B)) for " +
      "disjoint slices, on every component") {
    val a = corpus(0 until 400)
    val b = corpus(400 until 1000)
    val whole = Digest.shardDigests(a.unionByName(b),
        $"doc_id", $"text", shards = 16)
      .orderBy($"shard").collect()
    val folded = Digest.fold(Seq(
        Digest.shardDigests(a, $"doc_id", $"text", shards = 16),
        Digest.shardDigests(b, $"doc_id", $"text", shards = 16)))
      .orderBy($"shard").collect()
    assert(folded === whole)
  }

  test("fold is associative and order-independent across three " +
      "batches") {
    val parts = Seq(corpus(0 until 100), corpus(100 until 350),
      corpus(350 until 500))
    val ds = parts.map(Digest.shardDigests(_, $"doc_id", $"text"))
    val ltr = Digest.fold(Seq(Digest.fold(ds.take(2)), ds(2)))
      .orderBy($"shard").collect()
    val rev = Digest.fold(ds.reverse).orderBy($"shard").collect()
    assert(ltr === rev)
  }

  test("a single changed document moves exactly its shard's digest " +
      "(drift is localizable)") {
    val base = corpus(0 until 256)
    val tweaked = base.withColumn("text",
      when($"doc_id" === 37L, concat($"text", lit(" CHANGED")))
        .otherwise($"text"))
    val d0 = Digest.shardDigests(base, $"doc_id", $"text")
      .withColumnRenamed("digest", "d0")
      .select($"shard", $"d0")
    val d1 = Digest.shardDigests(tweaked, $"doc_id", $"text")
      .withColumnRenamed("digest", "d1")
      .select($"shard", $"d1")
    val moved = d0.join(d1, "shard").filter($"d0" =!= $"d1")
      .select($"shard").as[Long].collect().toSeq
    assert(moved === Seq(37L % 256))
  }

  test("two-level mod-sum equals the exact (arbitrary-precision) " +
      "mod at the overflow boundary: sub-bucket partials that " +
      "exceed the modulus reduce early without changing the value") {
    val df = corpus(0 until 20000)
    val hs = df.select(conv(substring(md5($"text".cast("binary")),
        1, 7), 16, 10).cast("long").as("h"))
      .as[Long].collect()
    // the fixture must actually cross the first-level boundary:
    // some (shard=0, sub) partial sum exceeds the modulus, so the
    // intermediate pmod genuinely fires
    val bySub = hs.groupBy(_ % Digest.SubBuckets)
      .map { case (_, v) => v.map(BigInt(_)).sum }
    assert(bySub.exists(_ > Digest.DefaultMod),
      "fixture too small: no sub-bucket partial crosses the modulus")
    val expected = hs.map(BigInt(_)).sum
      .mod(BigInt(Digest.DefaultMod)).toLong
    val got = Digest.shardDigests(df, $"doc_id", $"text", shards = 1)
      .collect()(0).getAs[Long]("digest")
    assert(got === expected)
  }

  test("mod below 2^28 is rejected (single-row hashes must already " +
      "be reduced for the two-level bound to hold)") {
    val e = intercept[IllegalArgumentException] {
      Digest.shardDigests(corpus(0 until 4), $"doc_id", $"text",
        shards = 4, mod = 1000003L)
    }
    assert(e.getMessage.contains("2^28"))
  }

  test("digest components are engine-portable values: 28-bit hashes, " +
      "mod applied") {
    val d = Digest.shardDigests(corpus(0 until 64), $"doc_id",
      $"text", shards = 4)
    val rows = d.collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val digest = r.getAs[Long]("digest")
      val mx = r.getAs[Long]("max_h")
      assert(digest >= 0 && digest < Digest.DefaultMod)
      assert(mx < (1L << 28), "hash must be the 7-hex-char prefix")
    }
  }
}
