package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization — greedy longest-match-first subword encoding
  * (the public BERT tokenizer algorithm: Wu et al. 2016; the HF
  * tokenizers reference implementation), completing the catalog's
  * tokenizer family next to BPE train/encode (x104/x57) and
  * unigram-Viterbi (x159). Per word: repeatedly take the LONGEST vocab
  * piece matching at the cursor (continuation pieces carry the "##"
  * prefix); if at any cursor no piece matches, the ENTIRE word encodes
  * as the single [UNK] id — the algorithm's all-or-nothing rule.
  *
  * Implementation mirrors [[AhoCorasick]]'s posture (§4.2 preference
  * order b): the vocabulary compiles once on the driver into two byte
  * tries (word-start pieces vs "##" continuations, stored without the
  * prefix) and rides along as a reference object; matching walks the
  * trie recording the deepest accepting node — greedy longest match in
  * one forward pass per piece, no per-row allocation beyond the output.
  * Patterns are required ASCII (the common vocab case; multi-byte UTF-8
  * contains no ASCII byte, so an out-of-alphabet byte simply fails the
  * match and routes the word to [UNK]).
  *
  * Ids are vocabulary positions with 0 reserved for [UNK] — entry 0 of
  * the supplied vocab MUST be the literal "[UNK]".
  */
final class WordPieceVocab(val pieces: Array[String]) extends Serializable {
  require(pieces.nonEmpty && pieces(0) == "[UNK]",
    "vocab entry 0 must be [UNK]")
  require(pieces.drop(1).forall(p =>
    p.nonEmpty && p.forall(_ < 128) && p.stripPrefix("##").nonEmpty),
    "vocab pieces must be non-empty ASCII")

  /** Byte trie compiled to flat arrays (children per node over a 128
    * alphabet — vocabs are small; clarity over compactness at build
    * time); accept holds the piece id or -1. Only the frozen arrays are
    * retained, so the vocab serializes with the plan. */
  private def buildTrie(entries: Seq[(String, Int)]): (Array[Array[Int]], Array[Int]) = {
    val nodes = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
    val accept = scala.collection.mutable.ArrayBuffer(-1)
    entries.foreach { case (s, id) =>
      var n = 0
      s.foreach { ch =>
        if (nodes(n)(ch) < 0) {
          nodes(n)(ch) = nodes.size
          nodes += Array.fill(128)(-1)
          accept += -1
        }
        n = nodes(n)(ch)
      }
      accept(n) = id
    }
    (nodes.toArray, accept.toArray)
  }

  private val (sNodes, sAccept) = buildTrie(
    pieces.zipWithIndex.drop(1).collect {
      case (p, id) if !p.startsWith("##") => (p, id)
    }.toSeq)
  private val (cNodes, cAccept) = buildTrie(
    pieces.zipWithIndex.drop(1).collect {
      case (p, id) if p.startsWith("##") => (p.substring(2), id)
    }.toSeq)

  /** Longest piece match at `pos` (byte offsets) in `b[0, len)`;
    * returns (pieceId << 32) | matchedLen, or -1 if nothing matches. */
  private def longest(b: Array[Byte], pos: Int, len: Int, cont: Boolean): Long = {
    val nodes = if (cont) cNodes else sNodes
    val accept = if (cont) cAccept else sAccept
    var n = 0
    var i = pos
    var best = -1L
    while (i < len) {
      val ch = b(i)
      if (ch < 0) return best // out-of-alphabet byte ends the walk
      val nxt = nodes(n)(ch)
      if (nxt < 0) return best
      n = nxt
      i += 1
      if (accept(n) >= 0) best = (accept(n).toLong << 32) | (i - pos).toLong
    }
    best
  }

  /** Encode one word: piece ids, or Array(0L) when any cursor fails. */
  def encode(word: UTF8String): Array[Long] = {
    val b = word.getBytes
    if (b.length == 0) return Array.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < b.length) {
      val m = longest(b, pos, b.length, cont = pos > 0)
      if (m < 0) return Array(0L) // whole-word [UNK]
      out += (m >>> 32)
      pos += (m & 0xffffffffL).toInt
    }
    out.toArray
  }
}

/** `array<bigint>` of WordPiece ids for one word (codegen expression). */
case class WordPieceEncode(child: Expression, vocab: WordPieceVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode expects string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      vocab.encode(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("wpVocab", vocab, classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray($v.encode($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPiece {
  /** Column-API entry point: WordPiece ids for a single-word column.
    * `vocab(0)` must be "[UNK]". */
  def encode(c: Column, vocab: Seq[String]): Column =
    GraftBridge.column(WordPieceEncode(
      GraftBridge.expression(c), new WordPieceVocab(vocab.toArray)))
}
