package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StagedSpec extends SparkSpec {
  import spark.implicits._

  test("getOrBuild builds once per key, serves later requests from " +
      "parquet, and distinct keys build independently") {
    var builds = 0
    def frame = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val r1 = Staged.getOrBuild(spark, "staged-spec/one")(frame)
    val r2 = Staged.getOrBuild(spark, "staged-spec/one")(frame)
    assert(builds === 1, "second request must NOT rebuild")
    assert(r2.orderBy($"k").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b")))
    assert(r1.orderBy($"k").collect() === r2.orderBy($"k").collect())
    Staged.getOrBuild(spark, "staged-spec/two")(frame)
    assert(builds === 2, "a distinct key is a distinct artifact")
  }

  test("keys that sanitize identically still get distinct artifacts " +
      "(raw-key hash suffix)") {
    var builds = 0
    def f(n: Long) = { builds += 1; spark.range(n).select($"id") }
    val a = Staged.getOrBuild(spark, "collide::key")(f(3))
    val b = Staged.getOrBuild(spark, "collide__key")(f(7))
    assert(builds === 2)
    assert(a.count() === 3L)
    assert(b.count() === 7L)
  }

  test("staged artifacts survive Scratch.sweep — the per-query " +
      "cleanup Verify/Bench run between queries") {
    var builds = 0
    def frame = { builds += 1; spark.range(5).select($"id") }
    Staged.getOrBuild(spark, "staged-spec/sweep")(frame)
    graft.Scratch.sweep()
    val back = Staged.getOrBuild(spark, "staged-spec/sweep")(frame)
    assert(builds === 1,
      "Scratch.sweep must not evict cross-query staged artifacts")
    assert(back.count() === 5L)
  }

  test("getOrBuildPath builds path-shaped artifacts once and returns " +
      "a stable path") {
    var builds = 0
    val p1 = Staged.getOrBuildPath("staged-spec/pathy") { p =>
      builds += 1
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(p, "sub"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "sub", "x.txt"), "payload")
    }
    val p2 = Staged.getOrBuildPath("staged-spec/pathy") { _ =>
      builds += 1
    }
    assert(builds === 1)
    assert(p1 === p2)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(p1, "sub", "x.txt")) === "payload")
  }
}
