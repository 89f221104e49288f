package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("split is deterministic and stable under table growth") {
    val small = ids(1000).withColumn("s", Sampling.splitColumn(col("id"), "x", 0.8))
    val big = ids(5000).withColumn("s", Sampling.splitColumn(col("id"), "x", 0.8))
    val smallMap = small.as[(Long, String)].collect().toMap
    val bigMap = big.as[(Long, String)].collect().toMap
    // every id keeps its assignment when the table grows
    assert(smallMap.forall { case (k, v) => bigMap(k) == v })
  }

  test("train fraction lands near the target and salts are independent") {
    val n = 20000
    val df = ids(n)
      .withColumn("a", Sampling.splitColumn(col("id"), "a", 0.8))
      .withColumn("b", Sampling.splitColumn(col("id"), "b", 0.8))
    val frac = df.filter($"a" === "train").count().toDouble / n
    assert(math.abs(frac - 0.8) < 0.02, s"got $frac")
    // independence: P(both train) ≈ 0.64, not 0.8
    val both = df.filter($"a" === "train" && $"b" === "train").count().toDouble / n
    assert(math.abs(both - 0.64) < 0.03, s"got $both")
  }

  test("samplePredicate with frac = 1.0 keeps every row") {
    // regression: floor(1.0 * 2^32) formats as 9-char "100000000", which
    // sorts below most 8-char prefixes and silently kept ~6% of rows
    val n = ids(2000).filter(Sampling.samplePredicate(col("id"), "s", 1.0)).count()
    assert(n == 2000)
  }

  test("samplePredicate keeps ~frac of rows, deterministically") {
    val n = 20000
    val kept = ids(n).filter(Sampling.samplePredicate(col("id"), "s", 0.1)).count()
    assert(math.abs(kept.toDouble / n - 0.1) < 0.01, s"kept $kept")
    val again = ids(n).filter(Sampling.samplePredicate(col("id"), "s", 0.1)).count()
    assert(kept == again)
  }
}
