package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("globalShuffleShards: rn is the exact global (md5, id) rank; " +
      "shards are contiguous fixed-size blocks") {
    val ids = (1L to 500L).toDF("doc_id")
    val out = Sharding.globalShuffleShards(ids, $"doc_id", "t", 64L)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length === 500)
    // independent reference rank: sort by (h, id) in Scala
    val expect = out.map { case (id, hh, _, _) => (hh, id) }.sorted
      .zipWithIndex.map { case ((_, id), ix) => id -> (ix + 1L) }.toMap
    out.foreach { case (id, _, rn, shard) =>
      assert(rn === expect(id))
      assert(shard === (rn - 1) / 64)
    }
    // every shard except the last is exactly full
    val sizes = out.groupBy(_._4).view.mapValues(_.length).toMap
    val last = sizes.keys.max
    sizes.foreach { case (s, n) =>
      if (s != last) assert(n === 64) else assert(n === 500 - 64 * last)
    }
  }

  test("globalShuffleShards is invariant under input partitioning") {
    val ids = (1L to 300L).toDF("doc_id")
    val a = Sharding.globalShuffleShards(ids, $"doc_id", "s", 50L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val b = Sharding.globalShuffleShards(ids.repartition(13), $"doc_id",
        "s", 50L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("negativeSamples: deterministic, k per query minus self-hits, " +
      "negatives come from the pool") {
    val pool = (1L to 200L).toDF("doc_id")
    val qs = Seq(5L, 6L, 7L).toDF("doc_id")
    val out = Sharding.negativeSamples(qs, $"doc_id", pool, $"doc_id",
        k = 4, buckets = 64, seed = "n")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // each (qid, i) appears at most once; negatives within the pool
    assert(out.map(r => (r._1, r._2)).distinct.length === out.length)
    assert(out.forall(r => r._3 >= 1L && r._3 <= 200L && r._3 != r._1))
    assert(out.length >= 3 * 3) // at most one self/empty drop per query
    // rerun is bit-identical
    val again = Sharding.negativeSamples(qs, $"doc_id", pool, $"doc_id",
        k = 4, buckets = 64, seed = "n")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === again.toSeq)
  }
}
