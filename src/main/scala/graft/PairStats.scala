package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-decade LSH pair-count instrument (SCALE.md's x18 watch item): runs
  * [[graft.ops.TextDedup.lshPairStats]] over the SAME clone corpus the
  * x18 dedup family builds (documents ∪ id-shifted clone — mirror of
  * PipelineQueries.docCorpus) and prints one JSON line. Run it at
  * sf0.1 / 10× / 100× and compare: candidate growth tracking corpus
  * growth means the banding holds; superlinear joined_rows means bucket
  * saturation (the x06 failure mode) and the banding needs retuning.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.PairStats /root/testdata/sf0.1"
  */
object PairStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = Tables.documents(spark, dir)
    val corpus = doc.unionByName(doc.select(
      (col("doc_id") + 10000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars")))
    val t0 = System.nanoTime()
    val r = graft.ops.TextDedup.lshPairStats(corpus).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"sf_dir":"$dir","n_docs":${r.getLong(0)},""" +
      f""""n_buckets":${r.getLong(1)},"max_bucket":${r.getLong(2)},""" +
      f""""joined_rows":${r.getLong(3)},"n_candidates":${r.getLong(4)},""" +
      f""""n_verified":${r.getLong(5)},"secs":$secs%.1f}""")
    spark.stop()
  }
}
