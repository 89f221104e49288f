package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

/** Bloom-prefiltered exact semi-join — the 100 TB posture for membership
  * checks against a reference set that is too large to broadcast verbatim.
  *
  * x19's exact contamination check broadcasts the benchmark's shingle SET
  * (size ∝ total shingle bytes). At web-corpus scale that broadcast is the
  * first thing to die; the classic fix is a two-stage membership check:
  *
  *  1. build a space-bounded Bloom filter over the small side's keys
  *     (~10 bits/key at 1% fpp, independent of key WIDTH — a 40-byte
  *     shingle costs the same as a 4-byte id) and broadcast THAT;
  *  2. prefilter the big side with `mightContain` — a narrow, per-row,
  *     shuffle-free pass that discards every non-member except the fpp
  *     fraction of false positives;
  *  3. exact semi-join ONLY the surviving candidates against the small
  *     side to kill the false positives.
  *
  * Bloom filters have no false negatives, so stage 2 never drops a true
  * member and the composition returns EXACTLY the rows of a plain semi-join
  * (oracle-checkable against the exact SQL). The confirm join is left
  * unhinted on purpose: the candidate set is a small fraction of the big
  * side, so AQE may broadcast it at gate scale, while at 100 TB it becomes
  * a shuffled join whose BOTH inputs are small — the big side's corpus
  * never reaches an exchange.
  *
  * `expectedItems` overestimates are cheap (bits/key stays constant);
  * underestimates only RAISE the realized fpp — correctness is unaffected
  * because stage 3 is exact either way, the prefilter just prunes less.
  */
object BloomJoin {

  /** Exact `left_semi` of `big` against `small` on string column `key`,
    * Bloom-prefiltered as above. The UDF is the one non-codegen step: Spark
    * ships no Column-level `might_contain`, and a 2-hash probe per row is
    * cheap next to the shuffle it avoids. */
  def semiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((x: String) => x != null && bc.value.mightContainString(x))
    big.filter(might(col(key))).join(small, Seq(key), "left_semi")
  }
}
