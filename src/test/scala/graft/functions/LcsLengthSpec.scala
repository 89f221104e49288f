package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LcsLength (native codegen DP) vs a Scala-side reference LCS and the
  * known closed-form cases — the engine kernel behind x183. */
class LcsLengthSpec extends SparkSpec {
  import spark.implicits._

  private def refLcs(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Long](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def run(pairs: Seq[(Seq[String], Seq[String])]): Seq[Long] =
    pairs.toDF("ref", "cand")
      .select(LcsLength.lcs(col("ref"), col("cand")).as("lcs"))
      .collect().map(_.getLong(0)).toSeq

  test("matches a reference DP on fixed and random token arrays") {
    val rnd = new scala.util.Random(7)
    val fixed = Seq(
      (Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")), // identical -> 4
      (Seq("a", "b", "c"), Seq("x", "y", "z")), // disjoint -> 0
      (Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")), // -> 3
      (Seq.empty[String], Seq("a")), // empty -> 0
      (Seq("a"), Seq.empty[String]),
      (Seq("t", "t", "t"), Seq("t", "t")) // repeats -> 2
    )
    val random = (1 to 60).map { _ =>
      def arr = Seq.fill(rnd.nextInt(25))(('a' + rnd.nextInt(4)).toChar.toString)
      (arr, arr)
    }
    val all = fixed ++ random
    assert(run(all) == all.map { case (a, b) => refLcs(a, b) })
  }

  test("null elements never match; null arrays yield null") {
    val df = Seq(
      (Some(Seq(Some("a"), None, Some("b"))), Some(Seq(Some("a"), None, Some("b")))),
      (None, Some(Seq(Some("a")))),
      (Some(Seq(Some("a"))), None)
    ).toDF("ref", "cand")
      .select(LcsLength.lcs(col("ref"), col("cand")).as("lcs"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 2L) // the two nulls do NOT count as a match
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("runs inside whole-stage codegen") {
    // derive the arrays from range so ConvertToLocalRelation can't fold
    // the whole expression into a LocalTableScan
    val df = spark.range(3)
      .select(split(concat(lit("a b c x"), col("id")), " ").as("ref"),
        split(concat(lit("c a b y"), col("id")), " ").as("cand"))
      .select(LcsLength.lcs(col("ref"), col("cand")).as("lcs"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 2L, 2L))
    // the "*(n)" prefix marks operators inside a whole-stage-codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[lcslength".r.findFirstIn(plan).isDefined, plan)
  }
}
