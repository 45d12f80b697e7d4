package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int): DataFrame =
    spark.range(n).select($"id",
      concat(lit("doc text "), pmod($"id", lit(7))).as("k"))

  test("no false negatives: every inserted key probes true") {
    val df = corpus(500)
    val bf = Bloom.sketchBytes(df, $"k", expectedItems = 1000)
    assert(df.filter(!Bloom.mightContain(bf, $"k")).count() === 0)
  }

  test("false-positive rate is near the configured fpp") {
    val df = spark.range(2000).select(concat(lit("in-"), $"id").as("k"))
    val bf = Bloom.sketchBytes(df, $"k", expectedItems = 2000, fpp = 0.01)
    val absent = spark.range(2000)
      .select(concat(lit("out-"), $"id").as("k"))
    val falsePos = absent.filter(Bloom.mightContain(bf, $"k")).count()
    assert(falsePos < 2000 * 0.05, // generous headroom over 1%
      s"$falsePos false positives out of 2000 at fpp=0.01")
  }

  test("prefilteredSemiJoin == plain exact semi join") {
    val big = corpus(300)
    val small = corpus(300).filter(pmod($"id", lit(3)) === 0)
      .select(concat($"k", when($"id" < 150, lit("")).otherwise(lit("!")))
        .as("k"))
    val expected = big.join(small.select($"k").distinct(), Seq("k"),
      "left_semi").select($"id").collect().map(_.getLong(0)).sorted
    val got = Bloom.prefilteredSemiJoin(big, $"k", small, $"k",
        expectedItems = 1000)
      .select($"id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expected.toSeq)
  }

  test("prefilteredAntiJoin == plain exact anti join, and semi+anti " +
       "partition the big side") {
    val big = corpus(300)
    val small = corpus(90).filter(pmod($"id", lit(2)) === 0)
    val expected = big.join(small.select($"k").distinct(), Seq("k"),
      "left_anti").select($"id").collect().map(_.getLong(0)).sorted
    val anti = Bloom.prefilteredAntiJoin(big, $"k", small, $"k",
        expectedItems = 1000)
      .select($"id").collect().map(_.getLong(0)).sorted
    assert(anti.toSeq === expected.toSeq)
    val semi = Bloom.prefilteredSemiJoin(big, $"k", small, $"k",
        expectedItems = 1000)
      .select($"id").collect().map(_.getLong(0))
    assert((semi ++ anti).sorted.toSeq ===
      big.select($"id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("plan shape: the might_contain filter runs BELOW the big side's " +
       "shuffle (pre-exchange row elimination)") {
    val big = corpus(1000)
    // pin a shuffle join so there IS an exchange to be below
    val small = corpus(200).hint("merge")
    val df = Bloom.prefilteredSemiJoin(big, $"k", small, $"k",
      expectedItems = 1000)
    // AdaptiveSparkPlanExec exposes no children to TreeNode.collect —
    // unwrap to the current physical plan
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shufflesWithProbeBelow = exec.collect {
      case ex: ShuffleExchangeExec if ex.collect {
            case f: FilterExec
                if f.condition.toString.contains("might_contain") => f
          }.nonEmpty => ex
    }
    assert(shufflesWithProbeBelow.nonEmpty,
      "expected a Filter[might_contain] beneath a ShuffleExchange:\n" +
        exec.toString)
  }

  test("sketch size is bits, not rows: byte length tracks optimalNumBits") {
    val df = corpus(5000)
    val bf = Bloom.sketchBytes(df, $"k", expectedItems = 100000,
      fpp = 0.01)
    val bits = Bloom.optimalNumBits(100000, 0.01)
    // serialized form = header + bitmap words; stays within 2x of m/8
    assert(bf.length < 2 * bits / 8 + 64,
      s"sketch ${bf.length}B for m=$bits bits")
  }
}
