package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): (Long, Long) = {
    val i = (a & b).size.toLong
    (i, a.size.toLong + b.size.toLong - i)
  }

  test("prefix-filter join == brute-force all-pairs Jaccard >= 0.7 on real docs") {
    // EXACTNESS is the op's whole claim (vs the LSH estimator), so the
    // gate is equality with the O(n²) ground truth on a real corpus slice
    val docs = Tables.documents(spark, sf001).select("doc_id", "text").limit(120)
    val got = SimilarityJoin.jaccardJoin(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sets = docs.as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet }
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      (i, u) = jaccard(sa, sb) if i * 10 >= u * 7
    } yield (ia, ib, i, u)).toSet
    assert(expected.nonEmpty, "fixture produced no qualifying pairs — test is vacuous")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("identical docs always pair with Jaccard 1; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val got = SimilarityJoin.jaccardJoin(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L, 5L)))
  }

  test("threshold rationals other than 7/10 hold the guarantee (1/2 on a 3-of-4 overlap)") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c x"),   // i=3 u=5 → j=0.6: in at t=1/2, out at t=7/10
      (3L, "a y z w")).toDF("doc_id", "text")
    val half = SimilarityJoin.jaccardJoin(docs, tNum = 1, tDen = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(half == Set((1L, 2L, 3L, 5L)))
    val strict = SimilarityJoin.jaccardJoin(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(strict.isEmpty)
  }
}
