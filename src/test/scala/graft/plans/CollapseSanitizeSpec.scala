package graft.plans

import graft.SparkSpec
import graft.ops.Sanitize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class CollapseSanitizeSpec extends SparkSpec {
  import spark.implicits._

  /** Apply the rule directly to the analyzed plan (testing the rewrite
    * itself; end-to-end injection is covered in the extensions test). */
  private def rewritten(df: org.apache.spark.sql.DataFrame): Int = {
    val out = CollapseSanitize(df.queryExecution.analyzed)
    var n = 0
    out.transformAllExpressions {
      case r: org.apache.spark.sql.catalyst.expressions.RegExpReplace => n += 1; r
    }
    n
  }

  test("double sanitize collapses to one regexp_replace") {
    val df = Seq("a-b").toDF("v")
      .select(Sanitize.sanitize(Sanitize.sanitize(col("v"))).as("s"))
    var before = 0
    df.queryExecution.analyzed.transformAllExpressions {
      case r: org.apache.spark.sql.catalyst.expressions.RegExpReplace => before += 1; r
    }
    assert(before == 2)       // outer + inner
    assert(rewritten(df) == 1) // outer dropped through the cast/coalesce wrappers
    assert(df.as[String].collect().toSeq == Seq("ab"))
  }

  test("plain nested identical deletion collapses to one") {
    val df = Seq("a-b").toDF("v").select(
      regexp_replace(regexp_replace(col("v"), "[^ab]", ""), "[^ab]", "").as("s"))
    assert(rewritten(df) == 1)
  }

  test("different patterns do NOT collapse") {
    val df = Seq("a-b.c").toDF("v").select(
      regexp_replace(regexp_replace(col("v"), "[^a-z]", ""), "[^ab]", "").as("s"))
    assert(rewritten(df) == 2)
  }

  test("non-deletion replacements do NOT collapse (not idempotent)") {
    val df = Seq("aa").toDF("v").select(
      regexp_replace(regexp_replace(col("v"), "[^b]", "x"), "[^b]", "x").as("s"))
    assert(rewritten(df) == 2)
  }

  test("extensions wire the rule + cosine_sim into a fresh session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import ext.implicits._
      // function injection
      Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b").createOrReplaceTempView("ext_vecs")
      val c = ext.sql("SELECT cosine_sim(a, b) AS c FROM ext_vecs").as[Double].collect()(0)
      assert(c == 1.0)
      // optimizer-rule injection: nested sanitize over a view still collapses
      // in the OPTIMIZED plan of this session
      val df = ext.sql(
        "SELECT regexp_replace(regexp_replace(a[0] || 'x-', '[^a-z]', ''), '[^a-z]', '') AS s FROM ext_vecs")
      var n = 0
      df.queryExecution.optimizedPlan.transformAllExpressions {
        case r: org.apache.spark.sql.catalyst.expressions.RegExpReplace => n += 1; r
      }
      assert(n <= 1) // ≤: constant folding may remove it entirely
    } finally {
      // do NOT ext.stop(): local mode shares one SparkContext per JVM and
      // stopping it would kill every other suite's session
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
