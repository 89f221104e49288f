package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented odds and ends from the reference's file-massaging stages. */
object LineOps {

  /** R1 (/root/reference/main.py:33-42): append a comma to every line of a
    * line-oriented file (JSONL → comma-terminated). Kept for artifact parity;
    * the engine itself reads JSONL natively and never needs this step. */
  def convertToJson(spark: SparkSession, inPath: String, outPath: String): Unit =
    spark.read.text(inPath)
      .select(concat(col("value"), lit(",")).as("value"))
      .write.mode("overwrite").text(outPath)

  /** R9 (/root/reference/main.py:385-398): select the generated statements
    * that mention any missed id — a contains-predicate left-semi join. The
    * reference had this commented out and only printed; here it's the real
    * join, usable to re-drive a repair load. For large id sets prefer
    * extracting the key with regexp_extract and equi-joining instead of the
    * O(|statements|×|ids|) theta join. */
  def statementsForMissedIds(statements: DataFrame, missedIds: DataFrame): DataFrame =
    statements.join(
      missedIds,
      col("value").contains(col("id").cast("string")),
      "left_semi")
}
