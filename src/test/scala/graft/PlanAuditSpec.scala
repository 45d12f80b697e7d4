package graft

/** The 100×-scale plan bar as a CI gate, not a judge's audit: build
  * the physical plan of EVERY declared query at sf0.001 and assert
  *   - zero plan-construction errors,
  *   - zero CartesianProduct nodes,
  *   - zero partition-less Windows unprotected by a limit (the
  *     "one task sorts the whole table" anti-shape).
  * Plan SHAPE is SF-independent for these queries (broadcast sides
  * are bounded collections), so the cheap SF suffices. Runs on the
  * shared test session; memory-sink names are counter-unique, and
  * sf0.001 caches are small, so the census leaves no state another
  * suite could trip over.
  */
class PlanAuditSpec extends SparkSpec {

  test("all declared queries: zero plan errors, zero cartesian " +
      "products, zero unprotected global windows") {
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        PlanAudit.censusOne(spark, TestSpark.sfDir, name, fn)
    }
    val errors = rows.filter(_.error.isDefined)
    assert(errors.isEmpty, "plan errors:\n" + errors.map(c =>
      s"  ${c.name}: ${c.error.get.take(120)}").mkString("\n"))
    val cartesians = rows.filter(_.cartesians > 0)
    assert(cartesians.isEmpty, "cartesian products in: " +
      cartesians.map(_.name).mkString(", "))
    val globalWins = rows.filter(_.globalWins > 0)
    assert(globalWins.isEmpty, "unprotected global windows in: " +
      globalWins.map(_.name).mkString(", "))
    // the census must actually have covered the full declared surface
    assert(rows.length === SparkEntry.queries.size)
  }
}
