package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogTemplateSpec extends SparkSpec {
  import spark.implicits._

  test("mine: variable positions wildcard, fixed positions keep the " +
      "token, clusters split by (token count, first token)") {
    val lines = Seq(
      "conn from 10.0.0.7 took 42 ms",
      "conn from 10.9.1.2 took 7 ms",
      "conn from 10.0.0.7 took 9 ms",
      "disk full on /dev/sda1",  // support 1 -> filtered by default
      "boot ok",
      "boot ok" // 2-token cluster, fully fixed
    ).toDF("line")
    val out = LogTemplate.mine(lines, $"line")
      .as[(String, Long, Long)].collect()
    assert(out.toSet === Set(
      ("conn from <*> took <*> ms", 3L, 2L),
      ("boot ok", 2L, 0L)))
  }

  test("mine: whitespace runs collapse, blank lines drop, " +
      "minSupport filters") {
    val lines = Seq(
      "  a  b\tc ", "a x c", "a y c", "   ", ""
    ).toDF("line")
    val out = LogTemplate.mine(lines, $"line", minSupport = 3L)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("a <*> c", 3L, 1L)))
  }
}
