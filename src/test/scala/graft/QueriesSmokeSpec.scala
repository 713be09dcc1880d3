package graft

/** Every declared query must run at sf0.001, produce its declared schema,
  * and be deterministic across two executions (the oracle hash-compare
  * depends on that). */
class QueriesSmokeSpec extends SparkSpec {

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.size >= 50)
  }

  test("no module silently shadows another module's query names") {
    assert(SparkEntry.queries.size == SparkEntry.moduleQueryCount,
      "duplicate query name across modules")
  }

  test("graft_dot is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 0.5D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 1.0 * 3.0 + 2.0 * 0.5)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is deterministic") {
      val a = fn(spark, sf)
      val rows1 = a.collect()
      val rows2 = fn(spark, sf).collect()
      assert(rows1.toSeq == rows2.toSeq, s"$name nondeterministic")
      assert(rows1.length > 0 || name == "q15_anti_join", s"$name returned 0 rows")
    }
  }
}
