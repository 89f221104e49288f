package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (SURVEY.md §7.2.7 — sheet4-style skew where
  * 83% of edges share one relationship type is real in the reference data).
  *
  * AQE's skew-join split handles sort-merge cases at runtime; explicit
  * salting remains the tool when one side must be replicated anyway
  * (broadcast-unfriendly medium dims) or under aggregation hot keys.
  *
  * `saltedJoin(skewed, dim, key, n)`: the skewed side gets a random salt in
  * [0, n); the dim side is replicated n× with every salt value; the join key
  * becomes (key, salt), spreading each hot key over n reducers. Equivalence
  * to the plain inner join is by construction (every (key, salt) pairing
  * exists exactly once on the dim side) and pinned by SaltingSpec.
  */
object Salting {

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = skewed.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for hot grouping keys: pre-aggregate on
    * (key, salt), then final-aggregate on key. Exposed for counts/sums where
    * a single hot key would bottleneck one reducer. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
  }
}
