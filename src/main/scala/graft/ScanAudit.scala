package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (not part of the library surface): counts parquet
  * scans per fixture table in every catalog query's executed plan, to find
  * un-cached multi-consumer frames that re-run corpus work. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val tables = Seq("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "supplier", "part", "nation", "region")
    SparkEntry.catalog.foreach { q =>
      try {
        val p = q.build(spark, sf).queryExecution.executedPlan.toString
        val counts = tables.map { t =>
          t -> s"$t\\.parquet".r.findAllIn(p).length
        }.filter(_._2 >= 2)
        if (counts.nonEmpty)
          println(s"MULTI ${q.name}: ${counts.map { case (t, n) => s"$t=$n" }.mkString(" ")}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
