package graft.jx

import graft.SparkSpec
import org.apache.spark.sql.Row

/** JX query pipeline golden tests on sf0.001 — the query->expected
  * triple pattern of the reference's test_jx corpus (SURVEY.md §5). */
class RunnerSpec extends SparkSpec {

  test("groupby query returns one row per group") {
    val out = runner.run(
      """{"from": "lineitem", "groupby": ["l_returnflag"],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": ["l_returnflag"]}""").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("A", "N", "R"))
    assert(out.map(_.getLong(1)).sum === 6000L)
  }

  test("edges SetDomain is dense: empty partitions appear with count 0") {
    val out = runner.run(
      """{"from": "orders",
          "edges": [{"name": "st", "value": "o_orderstatus",
                     "domain": {"type": "set",
                                "partitions": ["O", "F", "P", "ZZZ"]}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(out.length === 4)
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("ZZZ") === 0L)
    // domain order preserved
    assert(out.map(_.getString(0)).toSeq === Seq("O", "F", "P", "ZZZ"))
  }

  test("edges DurationDomain: duration-string bounds, dense buckets") {
    val out = runner.run(
      """{"from": "events",
          "edges": [{"name": "dur", "value": "value",
                     "domain": {"type": "duration", "min": 0,
                                "max": "10minute", "interval": "2minute"}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(out.length === 5) // 600s / 120s, dense
    assert(out.map(_.getDouble(0)).toSeq ===
      Seq(0.0, 120.0, 240.0, 360.0, 480.0))
    // buckets match a direct filter of the fact table
    val direct = catalog.table("events")
      .filter("value >= 120 and value < 240").count()
    assert(out(1).getLong(1) === direct)
  }

  test("edges allowNulls adds an overflow partition") {
    val dense = runner.run(
      """{"from": "orders",
          "edges": [{"name": "st", "value": "o_orderstatus",
                     "allowNulls": true,
                     "domain": {"type": "set", "partitions": ["O", "F"]}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(dense.length === 3)
    val byKey = dense.map(r =>
      Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    // P-status rows land in the null/overflow partition
    assert(byKey("NULL") > 0)
    assert(byKey.values.sum === 1500L)
  }

  test("select.default fills empty cube cells (JX default clause)") {
    val out = runner.run(
      """{"from": "orders",
          "edges": [{"name": "st", "value": "o_orderstatus",
                     "domain": {"type": "set",
                                "partitions": ["O", "ZZZ"]}}],
          "select": [{"name": "total", "value": "o_totalprice",
                      "aggregate": "sum", "default": 0}]}""").collect()
    val byKey = out.map(r => r.getString(0) -> r.get(1)).toMap
    assert(byKey("ZZZ") === 0.0) // empty partition: default, not null
    assert(byKey("O").asInstanceOf[Double] > 0)
  }

  test("DefaultDomain remainder lumps into the overflow partition " +
       "when allowNulls") {
    val out = runner.run(
      """{"from": "orders",
          "edges": [{"name": "prio", "value": "o_orderpriority",
                     "allowNulls": true,
                     "domain": {"type": "default", "limit": 2}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(out.length === 3) // top-2 + overflow
    val total = out.map(_.getLong(1)).sum
    assert(total === 1500L) // nothing dropped
    val overflow = out.find(_.isNullAt(0)).get.getLong(1)
    assert(overflow > 0) // 3 remaining priorities lumped here
    // without allowNulls the remainder is dropped, top-k kept
    val strict = runner.run(
      """{"from": "orders",
          "edges": [{"name": "prio", "value": "o_orderpriority",
                     "domain": {"type": "default", "limit": 2}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(strict.length === 2)
    assert(strict.map(_.getLong(1)).sum === total - overflow)
  }

  test("time domain buckets cover [min,max) densely in order") {
    val out = runner.run(
      """{"from": "orders",
          "edges": [{"name": "w", "value": "o_orderdate",
                     "domain": {"type": "time", "min": "1996-01-01",
                                "max": "1996-02-01", "interval": "week"}}],
          "select": [{"name": "n", "aggregate": "count"}]}""").collect()
    assert(out.length === 5) // ceil(31/7)
  }

  test("limit before select (JX order): sort key may be dropped") {
    val out = runner.run(
      """{"from": "lineitem",
          "select": ["l_orderkey"],
          "sort": [{"value": "l_extendedprice", "sort": -1}],
          "limit": 3}""").collect()
    assert(out.length === 3)
  }

  test("window aggregate with where guard") {
    val out = runner.run(
      """{"from": "lineitem",
          "select": ["l_suppkey", "n_cheap"],
          "window": [{"name": "n_cheap", "aggregate": "count",
                      "value": "l_quantity",
                      "where": {"lt": ["l_quantity", 10]},
                      "edges": ["l_suppkey"], "sort": ["l_orderkey"]}],
          "limit": 5}""").collect()
    assert(out.nonEmpty)
  }

  test("nested from-path explodes arrays (snowflake)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build a nested table on the fly and register via a temp dir
    val tmp = graft.Scratch.dir("graft_nested")
    val nested = spark.range(3).select(col("id"),
      array(struct(col("id").as("x"), (col("id") * 2).as("y")))
        .as("children"))
    nested.coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("parent.parquet").toString)
    val cat = new graft.tables.Catalog(spark, tmp.toString)
    val out = cat.table("parent.children").collect()
    assert(out.length === 3)
    assert(out.head.schema.fieldNames.toSet === Set("id", "x", "y"))
  }

  test("two-level snowflake: from a.b.c digs two array levels") {
    import org.apache.spark.sql.functions._
    val tmp = graft.Scratch.dir("graft_nested2")
    // task -> runs[] -> artifacts[] (the reference's task shape)
    val tasks = spark.range(2).select(col("id").as("task_id"),
      array(struct(col("id").as("run_no"),
        array(struct(concat(lit("art_"), col("id")).as("name"),
                     (col("id") * 10).as("bytes")),
              struct(lit("log").as("name"), lit(5L).as("bytes")))
          .as("artifacts"))).as("runs"))
    tasks.coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("task.parquet").toString)
    val cat = new graft.tables.Catalog(spark, tmp.toString)
    val out = cat.table("task.runs.artifacts")
    // 2 tasks x 1 run x 2 artifacts = 4 rows; ancestors retained
    assert(out.count() === 4)
    assert(out.columns.toSet ===
      Set("task_id", "run_no", "name", "bytes"))
    // and the JX engine can aggregate over the nested level directly
    val agg = new Runner(spark, cat).run(
      """{"from": "task.runs.artifacts", "groupby": ["name"],
          "select": [{"name": "total_bytes", "value": "bytes",
                      "aggregate": "sum"}], "sort": ["name"]}""")
      .collect()
    assert(agg.map(_.getString(0)).toSeq.contains("log"))
  }

  test("items op turns a struct column into name/value pairs") {
    import org.apache.spark.sql.functions._
    val tmp = graft.Scratch.dir("graft_items")
    spark.range(2).select(col("id"),
        struct(col("id").as("x"), lit("v").as("y")).as("obj"))
      .coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("t.parquet").toString)
    val cat = new graft.tables.Catalog(spark, tmp.toString)
    val out = new Runner(spark, cat).run(
      """{"from": "t",
          "select": ["id", {"name": "kv", "value": {"items": "obj"}}],
          "sort": ["id"]}""").collect()
    val kv = out.head.getSeq[org.apache.spark.sql.Row](1)
    assert(kv.map(r => (r.getString(0), r.getString(1))) ===
      Seq(("x", "0"), ("y", "v")))
  }

  test("global aggregate without groupby") {
    val out = runner.run(
      """{"from": "lineitem",
          "select": [{"name": "n", "aggregate": "count"},
                     {"name": "stats", "value": "l_quantity",
                      "aggregate": "stats"}]}""").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 6000L)
    val stats = out.head.getStruct(1)
    assert(stats.getLong(0) === 6000L) // count
  }
}
