package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Grouped quantiles shaped for the 100 TB path.
  *
  * The production default is the Greenwald–Khanna sketch
  * (`approx_percentile`, rank error ≤ n/accuracy): one codegen'd
  * aggregation pass whose partial state is a bounded sketch per
  * (group, column), merged map-side — the only quantile shape that
  * survives unbounded-cardinality columns at cluster scale. The exact
  * interpolated form (`percentile`, = DuckDB `quantile_cont`) is kept
  * behind `exact = true` for parity tests and small frames: it is an
  * object aggregate whose partial state is EVERY value in the group, so
  * it forces a sort-based aggregation that does not amortize (measured
  * ~15× slower than the sketch on a 600k-row table, and the gap widens
  * with scale).
  *
  * Because a sketch result cannot be hash-compared across engines, the
  * companion [[rankContract]] emits the x37-pattern error contract: one
  * extra codegen'd pass counts the EXACT ranks below / at each estimate
  * and asserts the sketch's rank guarantee as booleans that a
  * cross-engine oracle checks as literal TRUE. Estimates stay
  * oracle-gated without demanding bit parity from an approximate
  * algorithm.
  *
  * Reference anchor: the reference has no quantile computation at all
  * (main.py processes rows one at a time); this is the engine-grade
  * generalization SURVEY §2.4 q40/q46/x20 declare.
  */
object Quantiles {

  /** One requested quantile: `valueCol` at fraction `q`, emitted as `name`. */
  final case class QSpec(valueCol: String, name: String, q: Double) {
    require(q > 0.0 && q < 1.0, s"quantile fraction out of (0,1): $q")
  }

  /** Grouped quantile estimates: `keys` ++ `n_v` (group row count) ++ one
    * column per spec. Specs sharing a value column share ONE sketch buffer
    * (the array form of approx_percentile), so k quantiles of a column
    * cost one sketch insert per row, not k.
    */
  def grouped(
      df: DataFrame,
      keys: Seq[String],
      specs: Seq[QSpec],
      accuracy: Int = 10000,
      exact: Boolean = false): DataFrame = {
    require(specs.nonEmpty)
    val fn = if (exact) "percentile" else "approx_percentile"
    val acc = if (exact) "" else s", $accuracy"
    val byCol = specs.groupBy(_.valueCol).toSeq.sortBy(_._1)
    val aggCols = byCol.map { case (v, ss) =>
      val qs = ss.map(_.q).mkString(", ")
      expr(s"$fn($v, array($qs)$acc)").as(s"__qv_$v")
    }
    val out = keys.map(col) ++ Seq(col("n_v")) ++ byCol.flatMap { case (v, ss) =>
      ss.zipWithIndex.map { case (sp, i) => col(s"__qv_$v")(i).as(sp.name) }
    }
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n_v"), aggCols: _*)
      .select(out: _*)
  }

  /** The x37-pattern error contract for [[grouped]]'s estimates: joins the
    * (tiny, broadcast) estimate frame back onto the data and, in ONE
    * codegen'd pass of conditional sums, checks each estimate's exact rank
    * position: rows-below ≤ (q+tol)·n AND rows-at-or-below ≥ (q−tol)·n.
    * Returns `keys` ++ `<name>_ok` booleans — the oracle asserts them TRUE.
    * `tol` defaults far above the sketch's n/accuracy guarantee so the gate
    * is deterministic across partition layouts while still catching a
    * broken sketch or an off-by-a-bucket estimate.
    */
  def rankContract(
      df: DataFrame,
      keys: Seq[String],
      estimates: DataFrame,
      specs: Seq[QSpec],
      tol: Double = 0.005): DataFrame = {
    val est = estimates.select((keys ++ specs.map(_.name)).map(col): _*)
    val counted = df.join(broadcast(est), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("__one"), // anchor so agg() varargs stay uniform
        specs.flatMap { sp =>
          val v = col(sp.valueCol)
          Seq(
            count(v).as(s"__n_${sp.name}"),
            sum(when(v < col(sp.name), 1L).otherwise(0L)).as(s"__lt_${sp.name}"),
            sum(when(v <= col(sp.name), 1L).otherwise(0L)).as(s"__le_${sp.name}"))
        }: _*)
    counted.select(keys.map(col) ++ specs.map { sp =>
      ((col(s"__lt_${sp.name}") <= (lit(sp.q + tol) * col(s"__n_${sp.name}"))) &&
        (col(s"__le_${sp.name}") >= (lit(sp.q - tol) * col(s"__n_${sp.name}"))))
        .as(s"${sp.name}_ok")
    }: _*)
  }
}
