package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Ad-hoc x05 stage decomposition (not a test). */
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
    val doc0 = spark.read.parquet(s"$sfDir/documents.parquet")
    doc0.count()
    def corpus = {
      val doc = doc0.repartition(32, col("doc_id"))
      doc.select(col("doc_id"), col("text"))
        .unionByName(doc.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    }
    (1 to 2).foreach { rnd =>
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"[t$rnd] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val raw = corpus
        .select(col("doc_id"), graft.ops.TextDedup.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(expr(graft.ops.TextDedup.shinglesExpr(3))).as("sh"))
        .repartition(col("sh"))
        .dropDuplicates("doc_id", "sh")
      val dfTab = raw.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100L).select("sh")
      val ex = raw.join(dfTab.hint("shuffle_hash"), Seq("sh"), "left_semi")
        .localCheckpoint(eager = true)
      lap("index+checkpoint")
      val nTab = ex.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("n"))
      val inter = ex.as("a")
        .join(ex.as("b").hint("shuffle_hash"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("i"))
      inter.write.format("noop").mode("overwrite").save()
      lap("selfjoin+agg")
      val fin = inter
        .join(nTab.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
        .join(nTab.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
        .withColumn("jaccard",
          round(col("i") / (col("na") + col("nb") - col("i")).cast(DoubleType), 6))
        .filter(col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard")
        .orderBy("a_id", "b_id")
      fin.write.format("noop").mode("overwrite").save()
      lap("sizes+sort+noop (incl selfjoin redo)")
    }
    spark.stop()
  }
}
