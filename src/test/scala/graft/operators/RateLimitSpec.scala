package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private val MinUs = 60000000L

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Sequential reference fold: (accepted, rejected, tokensLeft). */
  private def ref(minutes: Seq[Long], cap: Long, refill: Long,
                  cost: Long): (Long, Long, Long) = {
    var tokens = cap; var last = -1L; var acc = 0L; var rej = 0L
    minutes.foreach { m =>
      val gain = if (last < 0) 0L else (m - last) * refill
      tokens = math.min(cap, tokens + gain)
      if (tokens >= cost) { tokens -= cost; acc += 1 } else rej += 1
      last = m
    }
    (acc, rej, tokens)
  }

  test("tokenBucket: burst of 5 in one minute against capacity 3 " +
      "rejects exactly 2; a minute of idle refills 1") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L),
      (1L, 4L, 5L), // burst: 3 accepted, 2 rejected
      (1L, MinUs + 5L, 6L) // next minute: +1 token -> accepted
    ).toDF("u", "us", "id")
    val out = RateLimit.tokenBucket(ev, $"u", $"us", $"id",
        capacity = 3L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 6L, 4L, 2L, 0L)))
  }

  test("tokenBucket law: distributed fold == sequential replay on " +
      "random bursty traffic; acc+rej = n; 0 <= tokens <= cap") {
    val users = samples(
      Gen.choose(2, 60).flatMap(n => Gen.listOfN(n,
        Gen.choose(0L, 50L))), // minute stamps, heavy collisions
      25, seed = 9800L)
    val rows = users.zipWithIndex.flatMap { case (ms, u) =>
      ms.zipWithIndex.map { case (m, i) =>
        (u.toLong, m * MinUs + i, i.toLong) // distinct us inside minute
      }
    }.toDF("u", "us", "id")
    val out = RateLimit.tokenBucket(rows, $"u", $"us", $"id",
        capacity = 4L, refillPerMin = 2L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    users.zipWithIndex.foreach { case (ms, u) =>
      // fold order is (us, id) = insertion order per minute stamp
      val ordered = ms.zipWithIndex
        .sortBy { case (m, i) => (m * MinUs + i, i.toLong) }
        .map { case (m, i) => (m * MinUs + i) / MinUs }
      val (acc, rej, left) = ref(ordered, cap = 4L, refill = 2L,
        cost = 1L)
      val got = out(u.toLong)
      assert(got === ((u.toLong, ms.size.toLong, acc, rej, left)),
        s"user $u minutes=$ms")
      assert(got._3 + got._4 === got._2)
      assert(got._5 >= 0L && got._5 <= 4L)
    }
  }

  test("tokenBucketChunked law: chunked fold with carry-over state " +
      "== whole-list fold, for chunk sizes that split, straddle, and " +
      "exceed every entity") {
    val users = samples(
      Gen.choose(2, 60).flatMap(n => Gen.listOfN(n,
        Gen.choose(0L, 50L))),
      25, seed = 4177L)
    val rows = users.zipWithIndex.flatMap { case (ms, u) =>
      ms.zipWithIndex.map { case (m, i) =>
        (u.toLong, m * MinUs + i, i.toLong)
      }
    }.toDF("u", "us", "id")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Long)].collect().toSet
    val whole = norm(RateLimit.tokenBucket(rows, $"u", $"us", $"id",
      capacity = 4L, refillPerMin = 2L))
    // 3: every entity spans many chunks; 7: chunk boundaries straddle
    // minute boundaries arbitrarily; 1000: degenerate single chunk
    for (cs <- Seq(3, 7, 1000)) {
      val chunked = norm(RateLimit.tokenBucketChunked(rows, $"u",
        $"us", $"id", capacity = 4L, refillPerMin = 2L, chunkSize = cs))
      assert(chunked === whole, s"chunkSize=$cs")
    }
  }

  test("tokenBucketChunked on an empty input returns an empty frame " +
      "(same contract as tokenBucket), not a null-aggregate error") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("u", "us", "id")
    val out = RateLimit.tokenBucketChunked(empty, $"u", $"us", $"id",
      capacity = 3L)
    assert(out.columns.toSeq === Seq("entity", "n_events",
      "n_accepted", "n_rejected", "tokens_left"))
    assert(out.count() === 0L)
    assert(out.schema("entity").dataType ===
      org.apache.spark.sql.types.LongType)
  }
}
