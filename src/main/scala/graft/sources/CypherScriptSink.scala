package graft.sources

import org.apache.spark.sql.DataFrame

/** Statement-file sink: materializes a single-column DataFrame of Cypher
  * statements (from graft.ops.CypherCompiler) as a line-per-statement text
  * artifact — the reference's inter-stage IR (/root/reference/main.py:57,78,
  * 86,282). `single=true` writes one part file for faithful
  * one-file-per-stage artifacts; false keeps the parallel layout for scale.
  */
object CypherScriptSink {
  def write(statements: DataFrame, path: String, single: Boolean = true): Unit = {
    val df = if (single) statements.coalesce(1) else statements
    df.write.mode("overwrite").text(path)
  }
}
