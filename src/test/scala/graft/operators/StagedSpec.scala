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

  test("a failed build leaves nothing behind and the retry starts " +
      "clean (atomic tmp-dir build)") {
    var attempts = 0
    intercept[RuntimeException] {
      Staged.getOrBuildPath("staged-spec/flaky") { p =>
        attempts += 1
        // simulate a builder that wrote a partial sidecar, then died
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p, "partial.txt"), "half")
        throw new RuntimeException("builder died")
      }
    }
    val path = Staged.getOrBuildPath("staged-spec/flaky") { p =>
      attempts += 1
      // the retry must see an EMPTY dir: a leftover partial.txt from
      // attempt 1 would corrupt an appending builder
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(p, "partial.txt")),
        "retry saw the failed attempt's partial artifact")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "ok.txt"), "whole")
    }
    assert(attempts === 2)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "ok.txt")) === "whole")
    // same law for the DataFrame shape
    var dfBuilds = 0
    intercept[RuntimeException] {
      Staged.getOrBuild(spark, "staged-spec/flaky-df") {
        dfBuilds += 1; throw new RuntimeException("builder died")
      }
    }
    val back = Staged.getOrBuild(spark, "staged-spec/flaky-df") {
      dfBuilds += 1; spark.range(4).select($"id")
    }
    assert(dfBuilds === 2)
    assert(back.count() === 4L)
  }

  test("the artifact cache is bounded: above maxArtifacts the least-" +
      "recently-served artifacts are evicted and rebuild on demand") {
    val saved = Staged.maxArtifacts
    try {
      Staged.clear() // deterministic start: budget applies to THIS set
      Staged.maxArtifacts = 2
      var builds = Map.empty[String, Int].withDefaultValue(0)
      def get(k: String) = Staged.getOrBuild(spark, s"lru/$k") {
        builds += k -> (builds(k) + 1); spark.range(3).select($"id")
      }
      get("a"); get("b")
      get("a") // refresh a: LRU order is now  b < a
      get("c") // over budget: evicts b, keeps a + c
      assert(get("a").count() === 3L)
      assert(builds("a") === 1, "a was touched — must not have been evicted")
      get("b")
      assert(builds("b") === 2, "b was least-recently-served — evicted, rebuilt")
    } finally {
      Staged.maxArtifacts = saved
      Staged.clear()
    }
  }

  test("a live dir that lost its success marker is trashed when the " +
      "rebuild supersedes it — reclaimed by sweepTrash, never leaked " +
      "(r13 advice)") {
    try {
      Staged.clear()
      var builds = 0
      def get = Staged.getOrBuild(spark, "markerless/key") {
        builds += 1; spark.range(3).select($"id")
      }
      val first = get
      val firstDir = first.inputFiles.head
        .replaceFirst("/[^/]*$", "").replaceFirst("^file:", "")
      // externally damage the live generation: drop its marker
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(firstDir, "_SUCCESS"))
      val second = get
      assert(builds === 2, "a marker-less live dir must rebuild")
      val secondDir = second.inputFiles.head
        .replaceFirst("/[^/]*$", "").replaceFirst("^file:", "")
      assert(secondDir !== firstDir,
        "rebuild must land in a fresh generation dir")
      // deferred delete: the damaged dir's files are still readable
      // by a pre-damage frame until the epoch boundary...
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(firstDir)))
      assert(first.count() === 3L)
      // ...and the sweep reclaims it instead of leaking to JVM exit
      Staged.sweepTrash()
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(firstDir)),
        "superseded marker-less dir must be swept, not leaked")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(secondDir)))
      assert(second.count() === 3L)
    } finally Staged.clear()
  }

  test("eviction is deferred-delete: a frame obtained BEFORE the " +
      "eviction stays readable, the rebuild lands in a fresh " +
      "generation dir, and sweepTrash reclaims the old one") {
    val saved = Staged.maxArtifacts
    try {
      Staged.clear()
      Staged.maxArtifacts = 1
      var vBuilds = 0
      def victim = Staged.getOrBuild(spark, "defer/victim") {
        vBuilds += 1; spark.range(6).select($"id")
      }
      val held = victim // live lazy plan over generation 1's files
      val heldPath = held.inputFiles.head
        .replaceFirst("/[^/]*$", "").replaceFirst("^file:", "")
      // budget 1: requesting another key evicts the victim
      Staged.getOrBuild(spark, "defer/usurper") {
        spark.range(2).select($"id")
      }
      assert(held.count() === 6L,
        "a pre-eviction frame must stay readable (deferred delete)")
      // re-request rebuilds into a NEW generation; the held frame
      // still reads its own files
      val back = victim
      assert(vBuilds === 2, "evicted key rebuilds on demand")
      val backPath = back.inputFiles.head
        .replaceFirst("/[^/]*$", "").replaceFirst("^file:", "")
      assert(backPath !== heldPath,
        "rebuild must land in a fresh generation dir")
      assert(held.count() === 6L && back.count() === 6L)
      // epoch boundary: sweepTrash reclaims evicted generations only
      Staged.sweepTrash()
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(heldPath)),
        "sweepTrash must delete the evicted generation")
    } finally {
      Staged.maxArtifacts = saved
      Staged.clear()
    }
  }
}
