package graft

import org.apache.spark.sql.SparkSession

/** Scratch: cost of spark.read.parquet schema inference per call (warm). */
object Probe12c {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schemas = Seq("lineitem", "events", "documents")
      .map(t => t -> spark.read.parquet(s"$d/$t.parquet").schema).toMap
    for (round <- 1 to 3) {
      val t1 = System.nanoTime()
      var m = 0
      for (_ <- 1 to 20; t <- Seq("lineitem", "events", "documents")) {
        spark.read.schema(schemas(t)).parquet(s"$d/$t.parquet"); m += 1
      }
      println(f"[probe12c] round$round explicit ${(System.nanoTime() - t1) / 1e6 / m}%.1f ms/read")
      val t0 = System.nanoTime()
      var n = 0
      for (_ <- 1 to 20; t <- Seq("lineitem", "events", "documents")) {
        spark.read.parquet(s"$d/$t.parquet"); n += 1
      }
      println(f"[probe12c] round$round ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/read ($n reads)")
    }
    spark.stop()
  }
}
