package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val li = catalog.table("lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedAgg(li, Seq(col("l_returnflag")), 16,
        partial = Seq(sum("l_quantity").as("s"), count(lit(1)).as("c")),
        fin = Seq(sum("s").as("s"), sum("c").as("c")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === direct)
  }

  test("salted join equals plain join") {
    val li = catalog.table("lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = catalog.table("orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain = li.join(o, Seq("k")).count()
    val salted = Skew.saltedJoin(li, o, "k", 8).count()
    assert(salted === plain)
    // left join preserves unmatched left rows too
    val plainLeft = li.join(o, Seq("k"), "left").count()
    assert(Skew.saltedJoin(li, o, "k", 8, "left").count() === plainLeft)
  }
}
