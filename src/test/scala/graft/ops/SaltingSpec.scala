package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("saltedJoin ≡ plain inner join (orders ⋈ customer)") {
    val o = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_custkey", "k")
    val c = Tables.customer(spark, sf001).select(col("c_custkey").as("k"), col("c_name"))
    val plain = o.join(c, "k").select("o_orderkey", "c_name")
    val salted = Salting.saltedJoin(o, c, "k", salts = 8).select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedCount ≡ plain groupBy count under a hot key") {
    val df = Tables.lineitem(spark, sf001).select(col("l_returnflag").as("k")) // 3 hot keys
    val plain = df.groupBy("k").count().withColumnRenamed("count", "n")
    val salted = Salting.saltedCount(df, "k", salts = 16)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
