package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs through DuckDB as an oracle.
  *
  * Parity rules (see /root/repo/BASELINE.md canonicalization):
  *  - identical output column names on both sides;
  *  - a total-order ORDER BY over the output;
  *  - floating aggregates computed via exact DECIMAL sums then one
  *    deterministic cast to DOUBLE (double summation order differs between
  *    engines; decimal addition is exact and associative, so both engines
  *    produce bit-identical doubles);
  *  - integer outputs normalized to BIGINT on both sides.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact decimal sum of a double column, surfaced as a deterministic double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Sequential double dot product of two float-array columns; both engines
    * fold left-to-right in double, so results are bit-identical. */
  def dotd(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)
}
