package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k big-side keys, 300 of which are members of the 300-key small side
  private lazy val big = spark.range(10000)
    .select(concat(lit("key-"), col("id")).as("k"), col("id"))
  private lazy val small = spark.range(100, 400)
    .select(concat(lit("key-"), (col("id") % 300)).as("k")).distinct()

  test("bloom-prefiltered semi-join returns EXACTLY the plain semi-join rows") {
    val exact = big.join(small, Seq("k"), "left_semi")
    val bloomed = BloomJoin.semiJoin(big, small, "k", expectedItems = 1024, fpp = 0.01)
    assert(bloomed.count() == exact.count())
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }

  test("an UNDERestimated expectedItems raises fpp but never changes the answer") {
    val exact = big.join(small, Seq("k"), "left_semi")
    // 4 expected vs 300 actual: the filter saturates, prunes almost nothing
    val bloomed = BloomJoin.semiJoin(big, small, "k", expectedItems = 4, fpp = 0.01)
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }

  test("the prefilter prunes non-members and passes every member (no false negatives)") {
    val bf = small.stat.bloomFilter("k", 1024, 0.01)
    val members = small.as[String].collect()
    assert(members.forall(bf.mightContainString), "bloom dropped a true member")
    val passed = big.filter(udf((x: String) => bf.mightContainString(x)).apply(col("k"))).count()
    // 300 true members must pass; at 1% fpp the ~9700 non-members should
    // contribute ≲ a few hundred false positives, never the full big side
    assert(passed >= 300 && passed < 1000, s"prefilter passed $passed of 10000")
  }

  test("null keys on the big side are dropped like a semi-join drops them") {
    val withNull = big.unionByName(Seq((null: String, -1L)).toDF("k", "id"))
    val exact = withNull.join(small, Seq("k"), "left_semi")
    val bloomed = BloomJoin.semiJoin(withNull, small, "k", 1024, 0.01)
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }
}
