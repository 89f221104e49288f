package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sketch aggregates can't be oracle-gated (each engine's HLL differs), so
  * their accuracy contract is pinned here instead: the estimate must land
  * within the documented rsd of the exact answer on real fixture data. At
  * 100 TB approx_count_distinct is the survivable form of q08-style
  * distinct counting — a sketch shuffles O(1) state per group vs the exact
  * form's per-key dedup shuffle.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of exact on fixture columns") {
    val li = Tables.lineitem(spark, sf001)
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) {
      val exact = li.select(countDistinct(col(c))).first.getLong(0)
      val approx = li.select(approx_count_distinct(col(c), rsd = 0.02)).first.getLong(0)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"$c: exact=$exact approx=$approx err=$err")
    }
  }

  test("approx quantiles bracket the exact median") {
    val li = Tables.lineitem(spark, sf001)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).first.getDouble(0)
    val Array(approx) = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
