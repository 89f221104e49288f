package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** 2-D Hilbert-curve index as pure integer SQL arithmetic — the locality-
  * preserving file-layout key next to the Z-order accounting (x60). Both
  * curves interleave the two key dimensions so range scans touch few
  * files, but Hilbert never takes the long diagonal jumps Z-order takes
  * at quadrant boundaries, so per-file bounding boxes come out tighter —
  * x187 measures exactly that delta on the same (qb, pb) grid x60 uses.
  *
  * Formulation: the textbook xy2d loop (rotate/flip state carried down
  * the bit levels) is a sequential fold, which on the hot path would mean
  * an interpreted higher-order function per row. Instead the rotation
  * group is compiled OFFLINE into a 4-state automaton over quadrant
  * digits — for each (state, x-bit, y-bit): the emitted base-4 Hilbert
  * digit and the successor state. Both 16-entry tables pack into one
  * 32-bit constant each (2 bits per entry), so every level is three shift-
  * and-mask expressions; the per-level expressions are plain integer
  * arithmetic that BOTH engines execute verbatim (the x60 shared-string
  * discipline), and on the Spark side they stay inside whole-stage
  * codegen — no lambda, no UDF, no fold state.
  *
  * Table derivation is exhaustively verified against the reference xy2d
  * loop over the full 256×256 grid (HilbertCurveSpec re-checks a Scala
  * port of that loop against this arithmetic at multiple bit widths).
  *
  * Digit table (state*4 + 2*bx + by → base-4 digit), packed LSB-first:
  *   0,1,3,2  0,3,1,2  2,1,3,0  2,3,1,0   → 0x1E369CB4
  * Successor table (same index → next state):
  *   1,0,2,0  0,3,1,1  2,2,0,3  3,1,3,2   → 0xB7CA5C21
  */
object HilbertCurve {
  val DigitPack: Long = 0x1E369CB4L
  val StatePack: Long = 0xB7CA5C21L

  /** Per-level expression strings (idx, digit-accumulate, next-state) for
    * level k, reading integer columns `xc`/`yc` and the running columns
    * `s` (state) / `h` (index prefix). Dialect-neutral: `>> & * +` only. */
  def stepSql(xc: String, yc: String, k: Int): (String, String, String) = (
    s"(s * 4 + (($xc >> $k) & 1) * 2 + (($yc >> $k) & 1))",
    s"(h * 4 + (($DigitPack >> (2 * idx)) & 3))",
    s"(($StatePack >> (2 * idx)) & 3)")

  /** DuckDB CTE chain computing `hilbert` from integer columns `xc`, `yc`
    * of relation `rel` (whose other columns pass through). `bits` levels,
    * most-significant first. */
  def duckCtes(rel: String, xc: String, yc: String, bits: Int): String = {
    val init = s"h0 AS (SELECT *, 0 AS s, CAST(0 AS BIGINT) AS h FROM $rel)"
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val (idx, dig, st) = stepSql(xc, yc, k)
      s"""h${i + 1} AS (SELECT * EXCLUDE (s, h, idx), $dig AS h, $st AS s
         |  FROM (SELECT *, $idx AS idx FROM h$i) q)""".stripMargin
    }
    (init +: steps).mkString(",\n") +
      s",\nhx AS (SELECT * EXCLUDE (s, h), h AS hilbert FROM h$bits)"
  }

  /** Spark side: append a BIGINT `hilbert` column from integer columns
    * `xc`, `yc`. One projection per level — each level's `idx` is a
    * named column referenced twice, which keeps CollapseProject from
    * inlining the chain into an exponential expression tree (the x167
    * lesson, applied to plain projections). */
  def withIndex(df: DataFrame, xc: String, yc: String, bits: Int): DataFrame = {
    var out = df.withColumn("s", expr("0")).withColumn("h", expr("CAST(0 AS BIGINT)"))
    for (k <- bits - 1 to 0 by -1) {
      val (idx, dig, st) = stepSql(xc, yc, k)
      out = out.withColumn("idx", expr(idx))
        .withColumn("h2", expr(dig)).withColumn("s2", expr(st))
        .drop("idx", "h", "s")
        .withColumnRenamed("h2", "h").withColumnRenamed("s2", "s")
    }
    out.drop("s").withColumnRenamed("h", "hilbert")
  }
}
