package graft.ops

import graft.SparkSpec
import graft.ops.Quantiles.QSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // 1..100 in two groups with different spreads; deterministic shuffle-proof
  private def df = (1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i.toDouble))
    .toDF("g", "v")

  test("exact mode reproduces percentile_cont's interpolation (the parity path)") {
    val out = Quantiles.grouped(df, Seq("g"), Seq(
        QSpec("v", "p25", 0.25), QSpec("v", "p50", 0.5), QSpec("v", "p90", 0.9)),
      exact = true)
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect()
    // group a = 2,4,...,100 (50 values): p25 = 2 + 49·0.25 steps of 2 → 26.5
    val (_, na, a25, a50, a90) = out(0)
    assert(na == 50)
    assert(math.abs(a25 - 26.5) < 1e-9 && math.abs(a50 - 51.0) < 1e-9)
    assert(math.abs(a90 - (2 + 0.9 * 49 * 2)) < 1e-9) // 90.2
    // and equals Spark's own percentile() verbatim
    val ref = df.filter($"g" === "a")
      .agg(expr("percentile(v, array(0.25, 0.5, 0.9))")).head()
      .getSeq[Double](0)
    assert(Seq(a25, a50, a90) == ref)
  }

  test("sketch default satisfies its rank contract; exact mode trivially does") {
    for (exact <- Seq(false, true)) {
      val specs = Seq(QSpec("v", "p10", 0.1), QSpec("v", "p50", 0.5),
        QSpec("v", "p99", 0.99))
      val est = Quantiles.grouped(df, Seq("g"), specs, exact = exact)
      val oks = Quantiles.rankContract(df, Seq("g"), est, specs, tol = 0.02)
        .as[(String, Boolean, Boolean, Boolean)].collect()
      assert(oks.length == 2 && oks.forall(r => r._2 && r._3 && r._4), oks.toSeq)
    }
  }

  test("rank contract catches an off-rank estimate") {
    val specs = Seq(QSpec("v", "p50", 0.5))
    // forge a wildly wrong "median"
    val bad = df.groupBy("g").agg(count(lit(1)).as("n_v"), lit(5.0).as("p50"))
    val oks = Quantiles.rankContract(df, Seq("g"), bad, specs)
      .as[(String, Boolean)].collect()
    assert(oks.forall(!_._2), oks.toSeq)
  }

  test("specs sharing a value column share one sketch buffer (array form)") {
    // plan contains exactly ONE approx_percentile aggregate for v
    val est = Quantiles.grouped(df, Seq("g"),
      Seq(QSpec("v", "a", 0.1), QSpec("v", "b", 0.9)))
    val agg = est.queryExecution.optimizedPlan.toString()
    assert("approx_percentile".r.findAllIn(agg).size == 1, agg)
  }

  test("null and empty-group behavior: nulls excluded from ranks, n_v counts rows") {
    val withNulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val specs = Seq(QSpec("v", "p50", 0.5))
    val est = Quantiles.grouped(withNulls, Seq("g"), specs)
    val r = est.head()
    assert(r.getAs[Long]("n_v") == 3) // group rows, not non-null values
    val ok = Quantiles.rankContract(withNulls, Seq("g"), est, specs, tol = 0.26)
      .head().getAs[Boolean]("p50_ok")
    assert(ok)
  }
}
