package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),   // identical → 1.0
    (Array(1f, 0f), Array(0f, 1f)),           // orthogonal → 0.0
    (Array(1f, 2f), Array(-1f, -2f)),         // opposite → -1.0
    (Array(1f, 2f), Array(3f, 4f)))
    .toDF("a", "b")

  test("matches the composed zip_with/aggregate formulation bit-for-bit") {
    val composed = expr(
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
        |/ (sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))
        | * sqrt(aggregate(zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin)
    val out = pairs.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      composed.as("composed")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-identical
    assert(out(0).getDouble(0) == 1.0 && out(1).getDouble(0) == 0.0)
    assert(math.abs(out(2).getDouble(0) + 1.0) < 1e-12) // fp: sqrt(5)*sqrt(5) ≠ 5
  }

  test("null propagation") {
    val df = Seq((Some(Array(1f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("SQL registration: cosine_sim usable in spark.sql") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, sf001).limit(10).createOrReplaceTempView("emb_test")
    val n = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) AS c FROM emb_test a CROSS JOIN emb_test b")
      .filter("c >= -1.000001 AND c <= 1.000001").count()
    assert(n == 100)
  }

  test("stays inside whole-stage codegen (no CodegenFallback in plan)") {
    val e = Tables.embeddings(spark, sf001).limit(5)
    val df = e.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect() // force codegen path execution (would fall back loudly on bad gen code)
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a whole-stage-codegen stage
    assert("\\*\\(\\d+\\) Project \\[cosinesimilarity".r.findFirstIn(plan).isDefined, plan)
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val err = intercept[Exception](bad.select(VectorFunctions.cosine(col("a"), col("b"))).collect())
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
