package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 scratch probe: times sub-pipelines of expensive queries.
  * Dev-only; not part of the driver contract. */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame, label: String): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def timeIt[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val doc = Tables.documents(spark, sfDir)
    val corpus = doc.unionByName(doc.select(
      (col("doc_id") + 10000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars")))
    for (r <- 1 to 2) {
      println(s"== round $r ==")
      noop(graft.ops.TextDedup.minhashSignatures(corpus, 8), "minhashSignatures")
      noop(graft.ops.TextDedup.minhashSignatureArrays(corpus, 8), "minhashSignatureArrays")
      val pairs = timeIt("lshPairs (build+mat)") {
        graft.ops.TextDedup.lshPairs(corpus, 8, 2, 6)
      }
      println(s"[probe] pairs partitions=${pairs.rdd.getNumPartitions}")
      val mapping = timeIt("dedupMappingFromPairs") {
        graft.ops.TextDedup.dedupMappingFromPairs(corpus, pairs)
      }
      noop(mapping.orderBy("doc_id"), "orderBy+noop")
      graft.ops.CheckpointBlocks.sweep(spark)
    }
    spark.stop()
  }
}
