package graft

import org.apache.spark.sql.SparkSession

/** Temporary probe for engine surfaces — deleted before commit. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // 1. SQL pipe syntax
      try {
        val r = spark.sql(
          "FROM VALUES (1,'a'),(2,'b'),(3,'a') AS t(x,g) |> WHERE x > 1 |> AGGREGATE sum(x) AS s GROUP BY g |> ORDER BY g").collect()
        println("PIPE_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("PIPE_FAIL " + e.getMessage.take(200)) }
      // 2. parameterized SQL (named)
      try {
        val r = spark.sql("SELECT :lo + 1 AS v", Map("lo" -> 41)).collect()
        println("PARAM_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("PARAM_FAIL " + e.getMessage.take(200)) }
      // 3. observe
      try {
        import org.apache.spark.sql.functions._
        val df = spark.range(10).observe("m", sum("id").as("s"), count(lit(1)).as("n"))
        df.collect()
        // Observation metrics via listener are async; for batch, use Observation helper
        import org.apache.spark.sql.Observation
        val obs = Observation("m2")
        spark.range(5).observe(obs, sum("id").as("s")).collect()
        println("OBSERVE_OK " + obs.get.mkString(","))
      } catch { case e: Throwable => println("OBSERVE_FAIL " + e.getMessage.take(200)) }
      // 4. from_xml
      try {
        val r = spark.sql("SELECT from_xml('<r><a>1</a><b>x</b></r>', 'a INT, b STRING') AS v").collect()
        println("XML_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("XML_FAIL " + e.getMessage.take(200)) }
      // 5. hll sketch functions
      try {
        val r = spark.sql("SELECT hll_sketch_estimate(hll_sketch_agg(x)) FROM VALUES (1),(2),(2) t(x)").collect()
        println("HLL_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("HLL_FAIL " + e.getMessage.take(200)) }
      // 6. TABLESAMPLE repeatable
      try {
        val r = spark.sql("SELECT count(*) FROM (SELECT * FROM range(1000)) TABLESAMPLE (10 PERCENT) REPEATABLE (7)").collect()
        println("SAMPLE_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("SAMPLE_FAIL " + e.getMessage.take(200)) }
      // 7. interval arithmetic
      try {
        val r = spark.sql("SELECT (INTERVAL '1-2' YEAR TO MONTH) + (INTERVAL '2-11' YEAR TO MONTH) AS ym, (TIMESTAMP'2024-01-01 00:00:00' - TIMESTAMP'2023-12-30 10:00:00') AS dt").collect()
        println("INTERVAL_OK " + r.mkString(";"))
      } catch { case e: Throwable => println("INTERVAL_FAIL " + e.getMessage.take(200)) }
    } finally spark.stop()
  }
}
