package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequential NEXT-FIT bin packing per key — the whole-item counterpart of
  * x48's span-splitting offset packing: items (conversations, files,
  * shards) must land WHOLE in a bin, so bin assignment carries true reset
  * state (used + size > capacity → open a new bin) that no closed-form
  * window expresses. The Spark idiom for per-key sequential state is the
  * secondary sort: one repartition on the key, sortWithinPartitions by
  * (key, order), then a narrow mapPartitions whose state machine resets on
  * key change — every key's items are contiguous and ordered within one
  * partition, keys parallelize across partitions.
  *
  * An item larger than the capacity gets its own (overflowing) bin — the
  * caller sees it via the bin's token sum, never an error.
  *
  * Scale: parallelism is per KEY; a 100 TB run shards the key further
  * (e.g. (source, day)) to bound group size — packing quality is per-shard
  * next-fit either way, which is the published practice for training-batch
  * assembly (greedy packing is run per shard, not globally).
  */
object BinPacking {

  /** Returns the input rows + a `bin` column (0-based per key). The input
    * must contain `keyCol` (string) and `orderCol`/`sizeCol` (long). */
  def nextFit(df: DataFrame, keyCol: String, orderCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("bin", LongType, nullable = false))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val sizeIdx = df.schema.fieldIndex(sizeCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { it =>
        var curKey: String = null
        var bin = 0L
        var used = 0L
        it.map { r =>
          val k = r.getString(keyIdx)
          val sz = r.getLong(sizeIdx)
          if (k != curKey) { curKey = k; bin = 0L; used = sz }
          else if (used + sz > capacity) { bin += 1L; used = sz }
          else used += sz
          Row.fromSeq(r.toSeq :+ bin)
        }
      }
  }
}
