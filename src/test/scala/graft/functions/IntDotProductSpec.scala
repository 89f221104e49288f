package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntDotProductSpec extends SparkSpec {

  import spark.implicits._

  test("matches the composable aggregate/zip_with form on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextInt(255).toLong - 127),
        Array.fill(16)(rnd.nextInt(255).toLong - 127))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fused", IntDotProduct.intDot(col("a"), col("b")))
      .withColumn("composed", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    assert(df.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("codegen and interpreted paths agree; nulls and length mismatch follow the contract") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))),
      (2L, Some(Seq(1L, 2L, 3L, 99L)), Some(Seq(4L, 5L, 6L))), // prefix only
      (3L, None, Some(Seq(1L, 2L))),
      (4L, Some(Seq.empty[Long]), Some(Seq.empty[Long])))
      .toDF("id", "a", "b")
      .withColumn("d", IntDotProduct.intDot(col("a"), col("b")))
    val got = df.select("id", "d").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(1L -> Some(32L), 2L -> Some(32L), 3L -> None, 4L -> Some(0L)))
    // a null ELEMENT yields NULL — matching aggregate(zip_with(...)) and the
    // DuckDB oracle — in both the codegen and interpreted paths
    val withNullElems = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](4L, 5L)))
      .toDF("id", "a", "b")
      .withColumn("fused", IntDotProduct.intDot(col("a"), col("b")))
      .withColumn("composed", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    val ne = withNullElems.select("id", "fused", "composed").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(ne == Map(1L -> (None, None), 2L -> (Some(14L), Some(14L))))
    val eNull = IntDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](2L, null), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](5L, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)))
    assert(eNull.eval(null) == null)
    // interpreted path (eval directly, no codegen)
    val e = IntDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(5L, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 31L)
  }
}
