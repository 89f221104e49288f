package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via the Aho–Corasick automaton
  * (Aho & Corasick 1975, CACM 18(6)) — dictionary matching for corpus
  * pipelines: PII phrase lists, blocklists, benchmark-contamination
  * probes, taxonomy tagging. One pass over the text counts EVERY
  * occurrence of EVERY pattern (overlapping and nested included), where
  * the naive plan rescans the corpus once per pattern — at 100 TB the
  * difference between one scan and |dict| scans is the whole game, and
  * the dictionary (vocabulary-sized) broadcasts as a reference object
  * inside the expression.
  *
  * The automaton is byte-level over the UTF-8 encoding, so matching
  * never decodes or allocates per row; patterns are required to be
  * ASCII (the common dictionary case), which keeps byte positions and
  * character positions interchangeable — a multi-byte UTF-8 sequence
  * contains no ASCII byte, so it can never alias into a match.
  *
  * Construction is the textbook goto/fail/output build: a byte trie,
  * BFS failure links, full delta precomputation over the COMPACT
  * alphabet actually used by the dictionary (every other byte resets to
  * the root in O(1) via one bounds check), and per-state output lists
  * flattened to offset+ids arrays with fail-chain outputs inlined — the
  * matching loop is two array reads per input byte plus one counter
  * increment per emitted match.
  */
final class AhoCorasickAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern dictionary")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "patterns must be non-empty ASCII")

  /** byte value -> compact alphabet id, or -1 (root reset). */
  private val alphaOf: Array[Int] = {
    val m = Array.fill(128)(-1)
    var k = 0
    patterns.foreach(_.foreach { ch =>
      if (m(ch) < 0) { m(ch) = k; k += 1 }
    })
    m
  }
  private val alphaSize: Int = alphaOf.max + 1

  // delta(state, alphaId) -> state (fail links resolved at build time),
  // outOff/outIds: flattened per-state pattern-id output lists.
  private val (delta: Array[Int], outOff: Array[Int], outIds: Array[Int]) = {
    val children = ArrayBuffer(Array.fill(alphaSize)(-1))
    val ends = ArrayBuffer(ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { ch =>
        val a = alphaOf(ch)
        if (children(s)(a) < 0) {
          children(s)(a) = children.size
          children += Array.fill(alphaSize)(-1)
          ends += ArrayBuffer.empty[Int]
        }
        s = children(s)(a)
      }
      ends(s) += pid
    }
    val n = children.size
    val fail = new Array[Int](n)
    val d = new Array[Int](n * alphaSize)
    val queue = new java.util.ArrayDeque[Int]()
    var a = 0
    while (a < alphaSize) {
      val c = children(0)(a)
      if (c >= 0) { fail(c) = 0; queue.add(c); d(a) = c } else d(a) = 0
      a += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      // inherit the fail state's outputs: every pattern that is a proper
      // suffix of the path to s also ends here
      ends(s) ++= ends(fail(s))
      var a2 = 0
      while (a2 < alphaSize) {
        val c = children(s)(a2)
        if (c >= 0) {
          fail(c) = d(fail(s) * alphaSize + a2)
          queue.add(c)
          d(s * alphaSize + a2) = c
        } else d(s * alphaSize + a2) = d(fail(s) * alphaSize + a2)
        a2 += 1
      }
    }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + ends(i).size; i += 1 }
    val ids = new Array[Int](off(n))
    i = 0
    while (i < n) {
      var j = 0
      while (j < ends(i).size) { ids(off(i) + j) = ends(i)(j); j += 1 }
      i += 1
    }
    (d, off, ids)
  }

  /** Per-pattern occurrence counts over the UTF-8 bytes of `s`, one pass. */
  def countAll(s: UTF8String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      val b = s.getByte(i)
      state =
        if (b < 0 || alphaOf(b) < 0) 0
        else delta(state * alphaSize + alphaOf(b))
      var o = outOff(state)
      val end = outOff(state + 1)
      while (o < end) { counts(outIds(o)) += 1L; o += 1 }
      i += 1
    }
    counts
  }
}

/** `array<bigint>` of per-pattern occurrence counts (pattern order), as a
  * native codegen expression: the automaton rides along as a reference
  * object, the scan stays inside whole-stage codegen. */
case class AhoCorasickCounts(child: Expression, automaton: AhoCorasickAutomaton)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"aho_corasick_counts expects string, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      automaton.countAll(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasickAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray($h.countAll($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickCounts =
    copy(child = newChild)
}

object AhoCorasick {
  /** Column-API entry point: per-pattern occurrence counts, in the order
    * of `patterns`. The automaton is built once on the driver and ships
    * with the plan. */
  def matchCounts(c: Column, patterns: Seq[String]): Column =
    GraftBridge.column(AhoCorasickCounts(
      GraftBridge.expression(c), new AhoCorasickAutomaton(patterns.toArray)))
}
