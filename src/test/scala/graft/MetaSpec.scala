package graft

/** Contract self-checks: the driver consumes SparkEntry maps blindly, so
  * drift between queries and oracles must fail the build, not the round.
  */
class MetaSpec extends SparkSpec {

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only entries)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly.isEmpty,
      s"queries without an oracle (add one or document why not): $rowsOnly")
  }

  test("every query builds a plan and the flagship returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).columns.nonEmpty, s"$name must build a plan")
    }
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL is well-formed (non-empty, single statement)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), name)
      assert(!sql.trim.endsWith(";"), s"$name: no trailing semicolon (driver wraps the SQL)")
    }
  }
}
