package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-repeat exact substring dedup — the suffix-array-style modality
  * of the published LLM-corpus pipeline (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better": remove every substring of
  * ≥ k tokens that occurs more than once in the corpus), reported as
  * MAXIMAL spans with (doc, start, len) extents rather than fixed-window
  * hits — a 90-token boilerplate block is one finding, not 66 overlapping
  * 25-gram fragments.
  *
  * Equivalence that makes the distributed plan exact: a position is
  * covered by some duplicated substring of length ≥ k IFF the k-gram
  * anchored at it is duplicated (any duplicated substring of length
  * L ≥ k is covered by its own duplicated k-windows; each duplicated
  * k-gram is itself such a substring). Each duplicated anchor p covers
  * the token interval [p, p + k); spans are the per-doc UNION of those
  * intervals: an island breaks only where the anchor gap is ≥ k (two
  * anchors p₁ < p₂ with p₂ − p₁ < k have overlapping windows and MUST
  * merge — gap-1 runs alone would emit overlapping, double-counted
  * spans for anchors duplicated at, say, p and p+2 only), and each
  * island [p₁, p₂] yields the span [p₁, p₂ + k). A gap of exactly k
  * stays a break: windows [p₁, p₁+k) and [p₁+k, p₁+2k) merely touch,
  * and every position between the runs anchors a UNIQUE k-gram, so the
  * two runs are distinct repeats reported as distinct (touching,
  * still disjoint) spans.
  *
  * Distributed shape (never a global suffix array on one node):
  *   1. ANCHORS — one row per token position carrying only a 64-bit
  *      xxhash of its k-gram: the corpus-sized shuffle moves 8-byte
  *      keys, not k-token strings.
  *   2. CANDIDATES — hash buckets with ≥ 2 occupants, joined back to
  *      positions. All true occurrences of a duplicated gram share its
  *      hash, so no true positive can be lost here; collisions only ADD
  *      candidates.
  *   3. VERIFY — the k-gram TEXT is re-derived for candidate positions
  *      only (per-doc candidate lists joined to the token arrays) and
  *      grouped by content: a hash-collision candidate whose gram occurs
  *      once is dropped, making the result collision-proof without ever
  *      shuffling non-candidate text.
  *   4. SPANS — per-doc gaps-and-islands over verified positions (the
  *      q53 discipline): window partitioned by doc, bounded by document
  *      length, never corpus-sized.
  *
  * Scale posture: anchor volume is the corpus token count (linear); the
  * phase-1 aggregation is map-side combined on 8-byte keys; candidate
  * volume is the duplicated fraction (small on real corpora, and the
  * verify join touches only those docs); a boilerplate gram hot enough
  * to skew its bucket is an AQE skew-join case. Survivor policy stays
  * composable: the span frame joins back to the curation ops (x35/x38)
  * by doc_id.
  *
  * Positions are 0-based token indices; a span (doc_id, start, len)
  * covers tokens [start, start + len).
  */
object MaximalRepeats {

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      expr("filter(split(text, ' '), x -> x != '')").as("tk"))

  /** The anchor table of `docs(doc_id, source, text)`: one row per token
    * position carrying the 64-bit xxhash of its k-gram — the pure
    * function of a corpus an INCREMENTAL dedup stores as its index
    * (bucketed by `h`, so tomorrow's batch semi-joins it without
    * re-shuffling the corpus). */
  def anchors(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"span threshold must be >= 2 tokens: $k")
    toks(docs)
      .select(col("doc_id"), col("source"),
        posexplode(TextDedup.shingles(col("tk"), k)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("source"), col("pos"),
        xxhash64(col("gram")).as("h"))
  }

  /** Re-derive the k-gram TEXT for candidate positions only: `cand`
    * (doc_id, pos) is grouped per doc and joined to the raw docs, so
    * non-candidate text never moves — and non-candidate text is never
    * TOKENIZED either: the split/filter projection sits ABOVE the join
    * (round 12; it used to sit below, so every doc paid the tokenize even
    * when the join then dropped it — on the incremental path that was the
    * whole corpus re-tokenized to verify a candidate-sized set). */
  private def gramText(docs: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    val candPerDoc = cand.groupBy("doc_id")
      .agg(collect_list(col("pos")).as("cps"))
    docs.join(candPerDoc, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        expr("filter(split(text, ' '), x -> x != '')").as("tk"), col("cps"))
      .select(col("doc_id"), col("source"),
        explode(col("cps")).as("pos"), col("tk"))
      .select(col("doc_id"), col("source"), col("pos"),
        concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(k))).as("gram"))
  }

  /** Interval-union islands over verified positions → (doc_id, source,
    * start, len): break only when the anchor gap reaches k (window
    * [prev, prev+k) no longer overlaps [pos, pos+k)); the first row's
    * null lag falls through to the ELSE and opens island 1. The running
    * sum's default frame (unbounded preceding → current row) is exactly
    * the island id. */
  private def islands(verified: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    verified
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) < k, lit(0)).otherwise(lit(1)))
      .withColumn("run", sum(col("brk")).over(w))
      .groupBy("doc_id", "source", "run")
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) - min(col("pos")) + lit(k)).cast("long").as("len"))
      .select(col("doc_id"), col("source"),
        col("start").cast("long").as("start"), col("len"))
  }

  /** Maximal duplicated spans of ≥ `k` tokens over `docs(doc_id, source,
    * text)`; whitespace tokenization, empty tokens dropped. Occurrences
    * are counted corpus-wide (a phrase repeated twice INSIDE one document
    * is duplicated — the suffix-array semantics). */
  def spans(docs: DataFrame, k: Int): DataFrame = {
    val anch = anchors(docs, k)
    val dupH = anch.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2L).select("h")
    val cand = anch.join(dupH, Seq("h"))
      .select("doc_id", "source", "pos")
    // NOTE: verifyGrams feeds two consumers, so the verify pipeline is
    // duplicated in the one-shot plan; deliberately NOT materialized here
    // — spans() runs once per fixture as a DerivedStore build, and keeping
    // the full lineage in one lazy plan is what lets PlanShapeSpec pin the
    // corpus-sized anchor exchange (8-byte hashes, never gram text). The
    // per-batch incremental path below DOES materialize its twin frame.
    val verifyGrams = gramText(docs, cand, k)
    val dupGram = verifyGrams.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2L).select("gram")
    val verified = verifyGrams.join(dupGram, Seq("gram"))
      .select("doc_id", "source", "pos")
    islands(verified, k)
  }

  /** INCREMENTAL maximal-repeat dedup — today's batch against
    * yesterday's corpus: spans (in BATCH docs only) of ≥ k tokens
    * duplicated anywhere in the UNION of `newDocs` and `indexDocs`,
    * exactly `spans(newDocs ∪ indexDocs, k)` restricted to batch docs —
    * without re-anchoring the corpus. `indexAnchors` is the stored
    * anchor table (`anchors(indexDocs, k)`, a pure function of the index
    * — DerivedStore-backed at the call site, bucketed by `h`).
    *
    * Shape: batch anchors are hashed once (batch-sized); a batch
    * position is a CANDIDATE iff its hash occurs ≥ 2 times in the batch
    * or at least once in the index anchor table (a semi-join on the
    * 8-byte key against the h-bucketed store — never a corpus shuffle).
    * Verification re-derives gram TEXT batch-side for all candidates
    * and index-side ONLY for anchors whose hash matched a batch hash
    * (candidate-sized — every true cross-occurrence shares the hash, so
    * none is missed; collisions only add candidates and die at the text
    * compare). A gram is duplicated iff its batch count plus its index
    * count is ≥ 2 — the union semantics, collision-proof. Cost scales
    * with the BATCH (+ the candidate fraction of the index), not the
    * corpus. */
  def incrementalSpans(newDocs: DataFrame, indexDocs: DataFrame,
      indexAnchors: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"span threshold must be >= 2 tokens: $k")
    // batch anchors feed THREE consumers (dup-hash counts, the distinct
    // hash probe, and the candidate join) — materialize once; the frame
    // is batch-token-sized, the thing this operator keeps small. The
    // coalesce undoes union-branch partition fan-out (each branch of a
    // unioned batch frame carries its own partitioning; the checkpointed
    // RDD would otherwise pin nBranches × width partitions and every
    // downstream stage would pay that task count — round 12 measured a
    // 4-branch batch at 128 tiny partitions)
    val width = newDocs.sparkSession.sparkContext.defaultParallelism
    val bAnch = anchors(newDocs, k).coalesce(width).localCheckpoint(true)
    val bDupH = bAnch.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2L).select("h")
    // index rows whose hash occurs in the batch — ONE scan of the
    // h-bucketed store (round 12; hitH and idxCand used to be two
    // independent store joins = two corpus-sized scans), semi-joined on
    // the batch's 8-byte hashes and materialized candidate-sized. Both
    // downstream consumers (the hash-set union feeding candH and the
    // index-side gram re-derivation) read this one frame.
    val idxHit = indexAnchors
      .join(bAnch.select("h"), Seq("h"), "left_semi")
      .localCheckpoint(true)
    val hitH = idxHit.select("h").distinct()
    val candH = bDupH.unionByName(hitH).distinct()
    val candB = bAnch.join(candH, Seq("h")).select("doc_id", "pos")
    // candidate-sized, two consumers (bCnt + the verified join) — same
    // duplication argument as in spans()
    val bGram = gramText(newDocs, candB, k).localCheckpoint(true)
    val idxCand = idxHit.select("doc_id", "pos")
    val iGram = gramText(indexDocs, idxCand, k).select("gram")
    val bCnt = bGram.groupBy("gram").agg(count(lit(1)).as("bc"))
    val iCnt = iGram.groupBy("gram").agg(count(lit(1)).as("ic"))
    val dupGram = bCnt.join(iCnt, Seq("gram"), "left")
      .filter(col("bc") + coalesce(col("ic"), lit(0L)) >= 2L)
      .select("gram")
    val verified = bGram.join(dupGram, Seq("gram"))
      .select("doc_id", "source", "pos")
    islands(verified, k)
  }
}
