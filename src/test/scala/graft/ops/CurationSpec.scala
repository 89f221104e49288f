package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))

  // stopword-dense long text scores high; a short stopword-free fragment low
  private val good = ("the a of and to " * 8).trim
  private val bad = "zzz"

  test("curate = quality filter -> exact dedup -> deterministic split, composed") {
    val docs = mkDocs(1L -> good, 2L -> good, 3L -> bad, 4L -> (good + " extra"))
    val out = Curation.curate(docs, minQuality = 0.38, trainFrac = 0.8)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // 3 dropped by quality; 2 deduped into 1 (min id survives); 4 distinct
    assert(out.keySet == Set(1L, 4L))
    // split must equal the standalone Sampling assignment for the same ids
    val expected = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), "split", 0.8).as("s"))
      .as[(Long, String)].collect().toMap
    assert(out.forall { case (id, s) => expected(id) == s })
  }

  test("all copies of a text share one quality score, so dedup order cannot change the answer") {
    val docs = mkDocs(10L -> good, 11L -> good, 12L -> good)
    val q = Curation.withQuality(docs).select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    assert(q.values.toSet.size == 1)
    val survivors = Curation.curate(docs).select("doc_id").as[Long].collect()
    assert(survivors.toSeq == Seq(10L))
  }

  test("curate keeps input columns on survivors (library contract: enrich, not project)") {
    val docs = mkDocs(1L -> good).withColumn("lang", lit("en"))
    val cols = Curation.curate(docs).columns.toSet
    assert(Set("doc_id", "text", "n_chars", "lang", "quality_score", "split").subsetOf(cols))
  }

  test("curate with a near-dup mapping picks one survivor per COMPONENT, not per text") {
    // 1 and 2 have different texts but are declared near-dups by the
    // mapping; 4 is unmapped and must dedup as a singleton
    val docs = mkDocs(1L -> good, 2L -> (good + " tail"), 4L -> (good + " other"))
    val mapping = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canonical_id")
    val out = Curation.curate(docs, nearDupMapping = Some(mapping))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L))
    // exact mode keeps both texts of the pair — near-dup mode is stricter
    val exact = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 2L, 4L))
    // survivor choice considers only QUALITY-PASSING members: when the
    // component's min id fails the filter, the next passing member survives
    val docs2 = mkDocs(1L -> bad, 2L -> good)
    val mapping2 = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canonical_id")
    val out2 = Curation.curate(docs2, nearDupMapping = Some(mapping2))
      .select("doc_id").as[Long].collect().toSet
    assert(out2 == Set(2L))
  }

  test("near-dup mode tolerates an input frame that already carries canonical_id") {
    val docs = mkDocs(1L -> good, 2L -> (good + " tail"))
      .withColumn("canonical_id", lit(99L)) // caller's column, must survive untouched
    val mapping = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canonical_id")
    val out = Curation.curate(docs, nearDupMapping = Some(mapping))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(out.select("canonical_id").as[Long].collect().toSeq == Seq(99L))
  }

  test("withQuality derives n_chars from length(text) when the input lacks the column") {
    val bare = Seq(1L -> good, 2L -> bad).toDF("doc_id", "text")
    val q = Curation.withQuality(bare)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val fromChars = Curation.withQuality(mkDocs(1L -> good, 2L -> bad))
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(q == fromChars)
    // and the derived scratch column is not leaked onto curate's output
    assert(!Curation.curate(bare).columns.contains("n_chars"))
  }
}
