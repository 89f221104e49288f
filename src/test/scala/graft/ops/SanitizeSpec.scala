package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SanitizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[String]): Seq[String] =
    vals.toDF("v").select(Sanitize.sanitize(col("v"))).as[String].collect().toSeq

  test("strips everything outside [a-zA-Z0-9\\s] (main.py:44-49)") {
    assert(run(Seq("He-llo, (World)! 42")) == Seq("Hello World 42"))
  }

  test("null becomes empty string") {
    assert(run(Seq(null)) == Seq(""))
  }

  test("whitespace survives, unicode is stripped") {
    assert(run(Seq("a\tb\nc", "αβγ-x")) == Seq("a\tb\nc", "x"))
  }

  test("idempotent: sanitize ∘ sanitize = sanitize") {
    val vals = Seq("Tumor necrosis factor alpha (TNF-alpha) inhibitors", "..", "", "ok")
    val once = run(vals)
    assert(run(once) == once)
  }

  test("numeric input casts to string first") {
    val got = Seq(42L).toDF("v").select(Sanitize.sanitize(col("v"))).as[String].collect()
    assert(got.toSeq == Seq("42"))
  }
}
