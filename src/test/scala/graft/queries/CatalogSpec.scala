package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke-level checks over the whole declared catalog; deep correctness is
  * the DuckDB oracle gate (tools/compare.py, driven by graft.Verify). */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and every query has an oracle") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    val noOracle = SparkEntry.catalog.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query runs at sf0.001 and returns rows") {
    val empty = SparkEntry.catalog.flatMap { q =>
      val n = q.build(spark, sf001).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("spark and oracle column names are declared consistently (spot contract)") {
    // The driver sorts columns by name before hashing; a rename on one side
    // is the classic silent mismatch. Check the Spark output column sets
    // appear verbatim in the oracle SQL text.
    SparkEntry.catalog.foreach { q =>
      val cols = q.build(spark, sf001).columns
      val sql = q.oracle.get.toLowerCase
      cols.foreach(c => assert(sql.contains(c.toLowerCase), s"${q.name}: column $c not in oracle SQL"))
    }
  }
}
