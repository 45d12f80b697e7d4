package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that the per-domain split made
  * breakable: Map `++` silently OVERWRITES on key collision, so two
  * domain objects declaring the same query name would drop one
  * definition without any compile error — this spec turns that into
  * a test failure. No SparkSession needed (map structure only). */
class SparkEntrySpec extends AnyFunSuite {

  private val domains = Seq(
    "Etl" -> (QueriesEtl.queries, QueriesEtl.oracleSql),
    "Graph" -> (QueriesGraph.queries, QueriesGraph.oracleSql),
    "Jx" -> (QueriesJx.queries, QueriesJx.oracleSql),
    "LlmA" -> (QueriesLlmA.queries, QueriesLlmA.oracleSql),
    "LlmB" -> (QueriesLlmB.queries, QueriesLlmB.oracleSql),
    "LlmC" -> (QueriesLlmC.queries, QueriesLlmC.oracleSql),
    "LlmD" -> (QueriesLlmD.queries, QueriesLlmD.oracleSql),
    "Streaming" -> (QueriesStreaming.queries, QueriesStreaming.oracleSql),
    "WarehouseA" -> (QueriesWarehouseA.queries, QueriesWarehouseA.oracleSql),
    "WarehouseB" -> (QueriesWarehouseB.queries, QueriesWarehouseB.oracleSql),
    "WarehouseC" -> (QueriesWarehouseC.queries, QueriesWarehouseC.oracleSql))

  test("no query name collides across domain objects (++ would " +
      "silently drop one side)") {
    val all = domains.flatMap(_._2._1.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(all.size === SparkEntry.queries.size)
    val allO = domains.flatMap(_._2._2.keys)
    val dupesO = allO.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupesO.isEmpty, s"duplicate oracle names: $dupesO")
    assert(allO.size === SparkEntry.oracleSql.size)
  }

  test("every query has an oracle and every oracle has a query, " +
      "within its own domain object") {
    domains.foreach { case (name, (qs, os)) =>
      assert(qs.keySet === os.keySet,
        s"$name: ${(qs.keySet diff os.keySet) ++ (os.keySet diff qs.keySet)}")
    }
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("query names follow the driver's naming shape") {
    val bad = SparkEntry.queries.keys.filterNot(
      _.matches("q\\d{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed names: $bad")
  }
}
