package graft.jx

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  test("table format: header + positional rows") {
    val q = QueryParser.parse(
      """{"from": "orders", "groupby": ["o_orderstatus"],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": ["o_orderstatus"], "format": "table"}""")
    val t = Formats.shaped(runner, q).asInstanceOf[Formats.JxTable]
    assert(t.header === Seq("o_orderstatus", "n"))
    assert(t.data.map(_.head) === Seq("F", "O", "P"))
  }

  test("cube format: dense 2-D nested arrays in domain order") {
    val q = QueryParser.parse(
      """{"from": "orders",
          "edges": [
            {"name": "st", "value": "o_orderstatus",
             "domain": {"type": "set", "partitions": ["O", "F", "P", "X"]}},
            {"name": "prio", "value": {"left": ["o_orderpriority", 1]},
             "domain": {"type": "set", "partitions": ["1", "2"]}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    val c = Formats.shaped(runner, q).asInstanceOf[Formats.JxCube]
    assert(c.edgeNames === Seq("st", "prio"))
    assert(c.domains(0) === Seq("O", "F", "P", "X"))
    assert(c.domains(1) === Seq("1", "2"))
    val n = c.data("n")
    assert(n.size === 4) // outer axis = st
    // empty partition X is present and zero-filled (dense)
    assert(n(3).asInstanceOf[IndexedSeq[Any]].forall(_ == 0L))
    // totals match the sparse truth
    val total = n.flatMap(_.asInstanceOf[IndexedSeq[Any]])
      .map(_.asInstanceOf[Long]).sum
    val truth = catalog.table("orders")
      .filter(org.apache.spark.sql.functions
        .col("o_orderpriority").startsWith("1") ||
        org.apache.spark.sql.functions
          .col("o_orderpriority").startsWith("2"))
      .count()
    assert(total === truth)
  }

  test("cube format: allowNulls overflow partition is a trailing cell") {
    // only 1-URGENT/2-HIGH are in-domain; the other three priorities
    // land in the null overflow partition, which domain-orders LAST
    val q = QueryParser.parse(
      """{"from": "orders",
          "edges": [
            {"name": "prio", "value": "o_orderpriority",
             "allowNulls": true,
             "domain": {"type": "set",
                        "partitions": ["1-URGENT", "2-HIGH"]}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    val c = Formats.shaped(runner, q).asInstanceOf[Formats.JxCube]
    assert(c.domains(0) === Seq("1-URGENT", "2-HIGH", null))
    val n = c.data("n").map(_.asInstanceOf[Long])
    val orders = catalog.table("orders")
    import org.apache.spark.sql.functions.col
    assert(n(0) === orders.filter(col("o_orderpriority") === "1-URGENT")
      .count())
    assert(n(1) === orders.filter(col("o_orderpriority") === "2-HIGH")
      .count())
    // overflow = everything else
    assert(n(2) === orders.count() - n(0) - n(1))
  }

  test("cube format: 3-edge nesting places every cell at its coords") {
    val q = QueryParser.parse(
      """{"from": "orders",
          "edges": [
            {"name": "st", "value": "o_orderstatus",
             "domain": {"type": "set", "partitions": ["O", "F", "P"]}},
            {"name": "p1", "value": {"left": ["o_orderpriority", 1]},
             "domain": {"type": "set", "partitions": ["1", "2", "5"]}},
            {"name": "price", "value": "o_totalprice",
             "domain": {"type": "range", "min": 0, "max": 1000000,
                        "interval": 500000}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    val c = Formats.shaped(runner, q).asInstanceOf[Formats.JxCube]
    assert(c.domains.map(_.size) === Seq(3, 3, 2))
    val n = c.data("n")
    // depth-3 nesting: outer=st, middle=p1, inner=price
    def cell(i: Int, j: Int, k: Int): Long =
      n(i).asInstanceOf[IndexedSeq[Any]](j)
        .asInstanceOf[IndexedSeq[Any]](k).asInstanceOf[Long]
    import org.apache.spark.sql.functions.col
    val orders = catalog.table("orders")
    for ((st, i) <- Seq("O", "F", "P").zipWithIndex;
         (p, j) <- Seq("1", "2", "5").zipWithIndex;
         k <- 0 to 1)
      assert(cell(i, j, k) === orders
        .filter(col("o_orderstatus") === st &&
          col("o_orderpriority").startsWith(p) &&
          col("o_totalprice") >= k * 500000 &&
          col("o_totalprice") < (k + 1) * 500000).count(),
        s"cell ($st, $p, $k)")
    // grand total = rows whose priority is in-domain (no allowNulls)
    val total = (for (i <- 0 to 2; j <- 0 to 2; k <- 0 to 1)
      yield cell(i, j, k)).sum
    assert(total === orders.filter(
      col("o_orderpriority").rlike("^[125]")).count())
  }

  test("cube format: zero-bucket domain yields a well-formed empty cube") {
    // range [5, 5) has zero buckets: the domain is empty, the dense
    // product is empty, and the cube must be structurally sound (no
    // crash, empty axes) — the Matrix degenerate case
    val q = QueryParser.parse(
      """{"from": "orders",
          "edges": [{"name": "b", "value": "o_totalprice",
                     "domain": {"type": "range", "min": 5, "max": 5,
                                "interval": 1}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    val c = Formats.shaped(runner, q).asInstanceOf[Formats.JxCube]
    assert(c.domains(0).isEmpty)
    assert(c.data("n").isEmpty)
  }

  test("cube format: filter matching nothing still densifies all cells") {
    val q = QueryParser.parse(
      """{"from": "orders",
          "where": {"eq": ["o_orderstatus", "NOPE"]},
          "edges": [
            {"name": "st", "value": "o_orderstatus",
             "domain": {"type": "set", "partitions": ["O", "F"]}},
            {"name": "p", "value": "o_custkey",
             "domain": {"type": "range", "min": 0, "max": 2,
                        "interval": 1}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "format": "cube"}""")
    val c = Formats.shaped(runner, q).asInstanceOf[Formats.JxCube]
    assert(c.domains(0) === Seq("O", "F"))
    assert(c.domains(1) === Seq(0.0, 1.0))
    // every cell exists and is zero-filled: density is domain-driven,
    // not data-driven
    val n = c.data("n").map(_.asInstanceOf[IndexedSeq[Any]])
    assert(n.size === 2 && n.forall(row =>
      row.size === 2 && row.forall(_ == 0L)))
  }

  test("leaves select flattens every column") {
    val out = runner.run(
      """{"from": "region", "select": [{"leaves": "."}], "limit": 2}""")
    assert(out.columns.toSeq === Seq("r_regionkey", "r_name"))
  }

  test("approx flag flips cardinality to approx_count_distinct") {
    val exact = runner.run(
      """{"from": "lineitem",
          "select": [{"name": "c", "value": "l_partkey",
                      "aggregate": "cardinality"}]}""")
    val approx = runner.run(
      """{"from": "lineitem", "approx": true,
          "select": [{"name": "c", "value": "l_partkey",
                      "aggregate": "cardinality"}]}""")
    assert(exact.queryExecution.analyzed.toString.contains("count"))
    assert(approx.queryExecution.analyzed.toString
      .toLowerCase.contains("approx"))
    val e = exact.collect().head.getLong(0)
    val a = approx.collect().head.getLong(0)
    assert(math.abs(a - e).toDouble / e < 0.1) // HLL within 10%
  }
}
