package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 focused regression test: the inline PQ codeword argmin
  * (`PipelineQueries.pqArgminCode` — codebook collected to the driver and
  * unrolled into one codegen projection) must return EXACTLY the codeword
  * the former broadcast-join + packed-min aggregation form returned, on
  * every row — including distance TIES (→ lowest cw, the min(struct(dv,
  * cw)) order) and codebooks with DROPPED (sb, cw) entries (the trained
  * book drops empty codewords; the join form simply never scored them).
  */
class PqArgminSpec extends SparkSpec {

  private def joinedForm(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb.withColumn("cv2",
        graft.functions.IntDotProduct.intDot(col("cvec"), col("cvec")))),
        Seq("sb"))
      .withColumn("dv", col("sub2") + col("cv2") - lit(2L) *
        graft.functions.IntDotProduct.intDot(col("sub"), col("cvec")))
      .groupBy("vec_id", "sb")
      .agg(min(col("dv") * lit(16L) + col("cw")).as("pk"))
      .select(col("vec_id"), col("sb"), (col("pk") % 16L).as("cw"))

  test("inline argmin == joined packed-min form, with ties and dropped codewords") {
    import spark.implicits._
    // deterministic synthetic corpus: 60 vectors × 8 subspaces of 8 dims,
    // residual-scale values in ±254 (the x210 range)
    val sub = spark.range(60).select(col("id").as("vec_id"),
        explode(expr("sequence(0, 7)")).as("sb"))
      .select(col("vec_id"), col("sb").cast("int").as("sb"),
        expr("""transform(sequence(0, 7), i ->
               |  CAST((vec_id * 37 + sb * 11 + i * 7) % 509 - 254 AS BIGINT))"""
          .stripMargin).as("sub"))
      .withColumn("sub2",
        graft.functions.IntDotProduct.intDot(col("sub"), col("sub")))
      .localCheckpoint(true)
    // codebook: 16 codewords × 8 subspaces, BUT (sb=2, cw=5), (sb=6, cw=0)
    // and ALL of cw=11 dropped — dropped entries must never be chosen.
    // cw=9 duplicates cw=3's vectors exactly: every row whose best dv
    // lands there is a TIE and must resolve to cw=3.
    val cbFull = (0 until 8).flatMap { sb =>
      (0 until 16).map { cw =>
        val base = if (cw == 9) 3 else cw // cw 9 mirrors cw 3 → ties
        (sb, cw.toLong,
          (0 until 8).map(i => ((sb * 13 + base * 29 + i * 17) % 509 - 254).toLong))
      }
    }.filterNot { case (sb, cw, _) =>
      (sb == 2 && cw == 5) || (sb == 6 && cw == 0) || cw == 11
    }
    val cb = cbFull.toDF("sb", "cw", "cvec")
      .withColumn("sb", col("sb").cast(LongType))
      .localCheckpoint(true)

    val inline = sub.withColumn("cw", PipelineQueries.pqArgminCode(cb))
      .select("vec_id", "sb", "cw")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val joined = joinedForm(sub, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(inline.size == 60 * 8, s"row count ${inline.size}")
    assert(inline == joined,
      s"inline vs joined diverge: only-inline=${(inline -- joined).take(5)} " +
        s"only-joined=${(joined -- inline).take(5)}")
    // the tie construction really exercised: some row must have chosen cw 3
    // while cw 9 scores identically (equal dv), proving tie → lowest cw
    assert(!inline.exists(_._3 == 9L),
      "cw 9 mirrors cw 3 — ties must resolve to the lowest codeword")
    assert(!inline.exists(_._3 == 11L), "dropped codeword 11 was chosen")
  }
}
