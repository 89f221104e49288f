package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Hash-based assignment (md5 of key + salt against a hex threshold) rather
  * than rand(): the decision is a pure narrow expression — no shuffle, no
  * state, reproducible across runs, engines, and table growth (a document's
  * split never changes when other rows are added, which random or
  * row-number splits cannot guarantee). Different salts give independent
  * splits from the same keys.
  */
object Sampling {

  /** 'train'/'val' assignment from the first 8 md5 hex chars of
    * "key:salt" — uniform on [0, 2^32), so P(train) = trainFrac ± 2^-32. */
  def splitColumn(key: Column, salt: String, trainFrac: Double): Column = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac must be in (0, 1)")
    val threshold = f"${math.floor(trainFrac * 4294967296.0).toLong}%08x"
    when(hashFrac(key, salt) < threshold, "train").otherwise("val")
  }

  /** Keep-this-row predicate for plain deterministic subsampling. */
  def samplePredicate(key: Column, salt: String, frac: Double): Column = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    // frac = 1 would format as the 9-char "100000000", which sorts BELOW
    // most 8-char hex prefixes and silently kept ~1/16 of rows
    if (frac == 1.0) lit(true)
    else hashFrac(key, salt) < f"${math.floor(frac * 4294967296.0).toLong}%08x"
  }

  private def hashFrac(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt)).cast("binary")), 1, 8)
}
