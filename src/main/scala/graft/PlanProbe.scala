package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for catalog queries (not a test; used during
  * development to audit physical plans before pinning them). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
