package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MozLogSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    """{"action":"suite_start","time":0}""",
    """{"action":"test_start","time":1,"test":"t/a"}""",
    """{"action":"test_status","time":2,"test":"t/a","subtest":"s1","status":"PASS","expected":"PASS"}""",
    """{"action":"test_status","time":3,"test":"t/a","subtest":"s2","status":"FAIL","expected":"PASS"}""",
    """{"action":"test_status","time":4,"test":"t/a","subtest":"s3","status":"TIMEOUT","expected":"PASS"}""",
    """{"action":"test_end","time":5,"test":"t/a","status":"OK","expected":"OK"}""",
    """{"action":"test_status","time":6,"test":"t/b","subtest":"u1","status":"PASS"}""",
    """{"action":"test_end","time":7,"test":"t/b","status":"CRASH","expected":"OK"}""",
    """{"action":"test_end","time":8,"test":"t/c","status":"OK"}""",
    """not json at all""",
    """{"action":"weird_action","test":"t/x"}""",
    """{"action":"test_status","time":9,"status":"FAIL"}""",
    """{"action":"suite_end","time":10}"""
  )

  test("parse: malformed, unknown-action, and incomplete lines dropped") {
    val parsed = MozLog.parse(fixture.toDF("line"), col("line"))
    // 3 suite/test_start markers + 4 test_status + 3 test_end = 10
    assert(parsed.count() === 10)
    assert(parsed.filter(_.action == "test_status").count() === 4)
  }

  test("testDocs: subtest order, counts, rollup, ok flag") {
    val docs = MozLog.testDocs(
        MozLog.parse(fixture.toDF("line"), col("line")))
      .orderBy("test").collect()
    assert(docs.length === 3)
    val a = docs(0)
    assert(a.getString(0) === "t/a")
    assert(a.getLong(1) === 3 && a.getLong(2) === 2) // n_subtests, n_failed
    assert(a.getString(3) === "OK")                  // end_status
    assert(a.getString(4) === "TIMEOUT")             // worst of subtests
    assert(!a.getBoolean(5))                         // failed subtests
    assert(a.getString(6) === "s1,s2,s3")            // time order
    val b = docs(1)
    assert(b.getString(4) === "CRASH" && !b.getBoolean(5))
    assert(b.getLong(2) === 0) // no failed subtest; CRASH is from end
    val c = docs(2)
    assert(c.getLong(1) === 0 && c.getString(4) === "OK")
    assert(c.getBoolean(5)) // no expected field -> default OK met
    assert(c.getString(6) === "")
  }
}
