package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CowMerge.touchedFiles — the file-pruning plan a copy-on-write MERGE
  * reads from stats alone (x217's planning layer). Soundness is proved
  * both directions against the data the stats describe: every file
  * containing a changed key is returned (completeness — a miss silently
  * LOSES an update), and every returned file's range contains a change
  * key (the stats-resolution tightness the interval join promises). */
class CowMergeSpec extends SparkSpec {
  import spark.implicits._

  // 6 files with gaps and varying spans; keys are the file's range ends
  // plus interior points. File f3 is an empty-range singleton; f5 sits
  // far away (bucket separation), f0/f1 are adjacent.
  private val stats = Seq(
    ("f0", 0L, 99L), ("f1", 100L, 199L), ("f2", 300L, 549L),
    ("f3", 600L, 600L), ("f4", 700L, 899L), ("f5", 100000L, 100249L)
  ).toDF("path", "kmin", "kmax")

  private def touched(keys: Long*): Set[String] =
    CowMerge.touchedFiles(stats, keys.toDF("k"), "k")
      .select("path").collect().map(_.getString(0)).toSet

  test("completeness: every file whose range contains a key is returned") {
    assert(touched(0L, 199L, 549L, 600L, 100249L)
      == Set("f0", "f1", "f2", "f3", "f5"))
    // boundary keys on BOTH ends of each range
    assert(touched(100L) == Set("f1"))
    assert(touched(899L) == Set("f4"))
  }

  test("tightness: keys in gaps or out of range touch nothing") {
    assert(touched(200L, 250L, 299L, 550L, 599L, 601L, 999L, 200000L)
      == Set.empty[String])
  }

  test("n_changes counts the change rows landing in each file") {
    val r = CowMerge.touchedFiles(
        stats, Seq(10L, 20L, 30L, 150L, 600L).toDF("k"), "k")
      .select("path", "n_changes").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("f0" -> 3L, "f1" -> 1L, "f3" -> 1L))
  }

  test("a key inside every file touches every file; duplicates count") {
    val keys = Seq(50L, 50L, 150L, 400L, 600L, 800L, 100100L).toDF("k")
    val r = CowMerge.touchedFiles(stats, keys, "k")
    assert(r.count() == 6)
    assert(r.filter(col("path") === "f0").select("n_changes")
      .first().getLong(0) == 2L)
  }

  test("empty change-set and empty stats both yield an empty plan") {
    assert(CowMerge.touchedFiles(stats, Seq.empty[Long].toDF("k"), "k")
      .count() == 0)
    assert(CowMerge.touchedFiles(stats.limit(0), Seq(1L).toDF("k"), "k")
      .count() == 0)
  }

  test("wide-span file dominating bucket width still meets narrow files") {
    // f_wide spans 10 buckets of the width ITS OWN span defines; narrow
    // files land inside single buckets — the explode covers all overlaps
    val st = Seq(("w", 0L, 9999L), ("n1", 500L, 520L), ("n2", 9000L, 9100L))
      .toDF("path", "kmin", "kmax")
    val r = CowMerge.touchedFiles(st, Seq(510L, 9050L).toDF("k"), "k")
      .select("path").collect().map(_.getString(0)).toSet
    assert(r == Set("w", "n1", "n2"))
  }
}
