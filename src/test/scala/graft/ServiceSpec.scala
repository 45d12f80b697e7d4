package graft

import com.fasterxml.jackson.databind.ObjectMapper

class ServiceSpec extends SparkSpec {
  private val mapper = new ObjectMapper()
  private def q(json: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(Service.query(spark, TestSpark.sfDir, json))

  test("list format returns row objects") {
    val r = q("""{"from": "region", "sort": ["r_regionkey"]}""")
    assert(r.get("data").size === 5)
    assert(r.get("data").get(0).get("r_name").asText.nonEmpty)
  }

  test("table format returns header + positional rows") {
    val r = q(
      """{"from": "orders", "groupby": ["o_orderstatus"],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": ["o_orderstatus"], "format": "table"}""")
    assert(r.get("header").get(0).asText === "o_orderstatus")
    assert(r.get("data").get(0).isArray)
    assert(r.get("data").size === 3)
  }

  test("cube format returns dense nested arrays") {
    val r = q(
      """{"from": "orders",
          "edges": [{"name": "st", "value": "o_orderstatus",
                     "domain": {"type": "set",
                                "partitions": ["O", "F", "P", "X"]}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    assert(r.get("edges").get(0).asText === "st")
    assert(r.get("domains").get(0).size === 4)
    val data = r.get("data").get("n")
    assert(data.size === 4)
    assert(data.get(3).asLong === 0L) // dense empty partition
  }

  test("service default limit bounds unlimited setop queries") {
    val r = q("""{"from": "lineitem", "select": ["l_orderkey"]}""")
    assert(r.get("data").size <= Service.DefaultLimit)
  }
}
