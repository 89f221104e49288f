package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants of x48 sequence packing. The oracle row proves the
  * two engines AGREE; this spec proves the agreed answer is actually a
  * packing: every document's tokens are placed exactly once, and every
  * pack is tiled contiguously to exactly L tokens (except each source's
  * final pack, which holds the stream's tail).
  */
class PackingSpec extends SparkSpec {
  private val L = 64L

  private lazy val packs =
    SparkEntry.queries("x48_sequence_packing")(spark, sf001).cache()

  private lazy val docs = graft.Tables.documents(spark, sf001)
    .select(col("source"), col("doc_id"),
      size(graft.ops.TextDedup.tokens(col("text"))).cast("long").as("n_tok"))

  test("every document's token span is placed exactly once, in full") {
    val placed = packs.groupBy("source", "doc_id")
      .agg(sum(col("doc_tok_hi") - col("doc_tok_lo")).as("placed"),
        min("doc_tok_lo").as("lo"), max("doc_tok_hi").as("hi"))
    val bad = placed.join(docs, Seq("source", "doc_id"))
      .filter(col("placed") =!= col("n_tok") ||
        col("lo") =!= 0L || col("hi") =!= col("n_tok"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
  }

  test("every pack is contiguously tiled; all but each source's last pack hold exactly L tokens") {
    val perPack = packs
      .groupBy("source", "pack_id")
      .agg(sum(col("doc_tok_hi") - col("doc_tok_lo")).as("filled"),
        min("pack_off").as("first_off"),
        // contiguity: spans tile with no gap iff max(end) - min(start) = sum(len)
        max(col("pack_off") + col("doc_tok_hi") - col("doc_tok_lo")).as("last_end"))
    val lastPack = perPack.groupBy("source").agg(max("pack_id").as("last_id"))
    val bad = perPack.join(lastPack, "source")
      .filter(
        col("first_off") =!= 0L ||
          col("last_end") =!= col("filled") || // gap or overlap inside the pack
          (col("pack_id") =!= col("last_id") && col("filled") =!= L) ||
          col("filled") > L)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
  }

  test("pack ids per source are dense from zero") {
    val ids = packs.groupBy("source")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
        countDistinct("pack_id").as("n"))
      .filter(col("lo") =!= 0L || col("n") =!= col("hi") + 1L)
    assert(ids.isEmpty, ids.limit(5).collect().mkString("\n"))
  }
}
