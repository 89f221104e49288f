package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage runner with parquet checkpoints — the structured replacement for the
  * reference's comment-toggled manual driver (/root/reference/main.py:400-409)
  * and its offset-resume idiom (main.py:318,341-346,365).
  *
  * Each stage's output is checkpointed to `$checkpointDir/<name>`; a
  * completed stage (marked by Spark's _SUCCESS file) is NOT recomputed on
  * re-run — the pipeline resumes at the first incomplete stage, which is
  * exactly the recovery behavior the reference hand-rolled with offsets,
  * minus the hand-rolling. Downstream stages read the checkpoint parquet, so
  * lineage is cut at every stage boundary.
  */
final class Pipeline(spark: SparkSession, checkpointDir: String) {

  final case class Stage(name: String, build: Map[String, DataFrame] => DataFrame)

  private val stages = scala.collection.mutable.ArrayBuffer[Stage]()

  def addStage(name: String)(build: Map[String, DataFrame] => DataFrame): Pipeline = {
    stages += Stage(name, build)
    this
  }

  private def path(name: String) = s"$checkpointDir/$name"

  private def isComplete(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Runs all stages in order; returns the outputs by stage name. */
  def run(): Map[String, DataFrame] = {
    var outputs = Map.empty[String, DataFrame]
    stages.foreach { st =>
      if (!isComplete(st.name)) {
        st.build(outputs).write.mode("overwrite").parquet(path(st.name))
      }
      outputs += st.name -> spark.read.parquet(path(st.name))
    }
    outputs
  }
}
