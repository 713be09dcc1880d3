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
