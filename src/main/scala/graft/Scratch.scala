package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness for a subset of catalog queries (not a test). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0ms")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    SparkEntry.catalog.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] ${q.name}%-24s min=${times.min}%.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
