package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc x25 stage decomposition (not a test). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0ms")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = Tables.documents(spark, sfDir)
    val corpus = doc.unionByName(doc.select((col("doc_id") + 10000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars")))
    corpus.count()
    (1 to 2).foreach { rnd =>
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"[t$rnd] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val pairs = graft.ops.TextDedup.lshCandidatePairs(corpus).filter(col("n_match") >= 6)
      println("pairs=" + pairs.count()); lap("lsh pairs")
      val nodes = corpus.select(lit("Doc").as("label"),
        col("doc_id").cast("string").as("key"),
        lit(null).cast("map<string,string>").as("props"))
      val edges = pairs.select(lit("Doc").as("src_label"),
        col("a_id").cast("string").as("src"), lit("Doc").as("dst_label"),
        col("b_id").cast("string").as("dst"), lit("NEAR_DUP").as("rel"))
      val cc = graft.ops.GraphAlgos
        .connectedComponents(graft.ops.GraphTable(nodes, edges))
        .select(col("key").cast("long").as("doc_id"), col("component"))
      println("cc=" + cc.count()); lap("graphx cc (incl pairs redo)")
    }
    spark.stop()
  }
}
