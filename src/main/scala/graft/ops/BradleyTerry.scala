package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{Decimal, DoubleType, StringType, StructField, StructType}

/** Fixed-round Bradley–Terry preference fitting (the RLHF/eval rating
  * primitive) via the standard minorization-maximization update
  * r_i ← w_i / Σ_j n_ij/(r_i+r_j).
  *
  * Same one-job lazy-chain construction as [[GraphAlgos.pagerankRounds]]:
  * a fixed round count needs no convergence barrier, so the rounds chain
  * over co-partitioned pair RDDs and materialize once — the unrolled
  * DataFrame form pays a sequential broadcast-build per rank join per
  * round (6 barriers for 3 rounds), which dominates on the
  * |items|²-bounded game frame the update actually iterates.
  *
  * Exactness mirrors the SQL twin term by term: each per-opponent term
  * n_ij/(r_i+r_j) is ONE IEEE division quantized to DECIMAL(18,8) through
  * Spark's own [[Decimal]] (the `CAST(x AS DECIMAL(18,8))` code path) and
  * summed as unscaled longs — exact integer addition, so merge order
  * never shows; the update w_i/S_i is one more IEEE division of exact
  * operands.
  *
  * `games`: (i STRING, j STRING, nij LONG, wij LONG), BOTH orientations
  * present (n_ij = n_ji, w_ij + w_ji = n_ij). Ranks init 1.0. Output:
  * (i, r) after exactly `rounds` updates. `parts` sizes the partitioner —
  * the frame is |items|²-bounded, so 1 is right until the item universe
  * itself is large. */
object BradleyTerry {
  def rounds(games: DataFrame, rounds: Int, parts: Int = 1): DataFrame = {
    val spark = games.sparkSession
    val part = new HashPartitioner(parts)
    val g = games.rdd
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2))))
      .partitionBy(part)
    val wins = games.rdd
      .map(r => (r.getString(0), r.getLong(3)))
      .reduceByKey(part, _ + _)
    var ranks = wins.mapValues(_ => 1.0)
    for (_ <- 1 to rounds) {
      ranks = g.join(ranks, part) // narrow: same partitioner
        .map { case (i, ((j, nij), ri)) => (j, (i, nij, ri)) }
        .partitionBy(part)
        .join(ranks, part)
        .map { case (_, ((i, nij, ri), rj)) =>
          val t = Decimal(nij.toDouble / (ri + rj))
          t.changePrecision(18, 8)
          (i, t.toUnscaledLong)
        }
        .reduceByKey(part, _ + _)
        .join(wins, part) // narrow
        .mapValues { case (s, wi) =>
          wi.toDouble /
            new java.math.BigDecimal(java.math.BigInteger.valueOf(s), 8).doubleValue
        }
    }
    spark.createDataFrame(
      ranks.map { case (i, r) => Row(i, r) },
      StructType(Seq(StructField("i", StringType), StructField("r", DoubleType))))
  }
}
