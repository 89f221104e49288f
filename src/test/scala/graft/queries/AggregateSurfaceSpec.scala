package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Aggregation-surface items from SURVEY §2.3 that aren't oracle-matchable
  * (approximate sketches) or are covered in the catalog by one family member
  * (rollup, for cube/grouping sets): exercised here instead.
  */
class AggregateSurfaceSpec extends SparkSpec {

  test("approx_count_distinct (HLL) lands within rsd of the exact count") {
    val o = Tables.orders(spark, sf001)
    val exact = o.select(countDistinct(col("o_custkey"))).first.getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"), rsd = 0.02)).first.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("cube produces all grouping combinations; rollup is its prefix subset") {
    val o = Tables.orders(spark, sf001).select("o_orderstatus", "o_orderpriority")
    val cube = o.cube(expr("o_orderstatus"), expr("o_orderpriority"))
      .agg(count(lit(1))).count()
    val rollup = o.rollup(expr("o_orderstatus"), expr("o_orderpriority"))
      .agg(count(lit(1))).count()
    val statuses = 3L // O, F, P
    val prios = 5L
    assert(cube == statuses * prios + statuses + prios + 1)
    assert(rollup == statuses * prios + statuses + 1)
  }

  test("GROUPING SETS via SQL with grouping_id disambiguation") {
    Tables.orders(spark, sf001).createOrReplaceTempView("orders_gs")
    val out = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, grouping_id() AS gid, count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    val gids = out.select("gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids == Set(1L, 2L, 3L)) // status-only, prio-only, grand total
  }
}
