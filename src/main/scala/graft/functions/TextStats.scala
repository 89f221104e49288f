package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass quality statistics over a text column: token count, summed
  * token length, stopword hits, and punctuation count, as one struct.
  *
  * Why a custom Expression (SURVEY.md §4.2 preference order b, the
  * [[CosineSimilarity]] argument): the composable form in
  * `ops.Curation.withQuality` — `aggregate(transform(tk, length))`,
  * `size(filter(tk, isin(...)))` — runs every higher-order lambda on
  * Catalyst's INTERPRETED path (CodegenFallback) and materializes the
  * token array per row, plus a separate regex scan for punctuation. At
  * ~sf1 that made x09 the worst genuine cross-engine ratio in the catalog
  * (5.2 s vs DuckDB's vectorized 0.8 s). This expression fuses all four
  * statistics into two linear scans (one over the lowered/trimmed text,
  * one over the original), stays inside whole-stage codegen, and
  * allocates nothing but the output row.
  *
  * Semantics contract (must stay bit-identical to the composed form —
  * `TextStatsSpec` pins it against the lambda formulation):
  *  - tokens are `split(trim(lower(text)), "\\s+")` with Java `limit=-1`
  *    semantics: a leading separator contributes one empty element, a
  *    trailing separator run contributes one empty element, and the empty
  *    string splits to `[""]` (so blank docs count 1 token, not 0);
  *  - `lower`/`trim` are the SAME UTF8String methods the built-ins call
  *    (full Unicode lowercasing; trim strips 0x20 only);
  *  - token length counts CODE POINTS (Spark `length`), not UTF-16 units;
  *  - `\s` is Java-regex ASCII whitespace `[ \t\n\f\r]`;
  *  - punctuation counts code points of the ORIGINAL text matching
  *    `[^a-zA-Z0-9\s]`, exactly `regexp_count`'s per-char class.
  */
final class TextStatsHelper(stopwordArr: Array[String]) extends Serializable {
  @transient private lazy val stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwordArr.foreach(s.add)
    s
  }

  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): InternalRow = {
    val s = text.toLowerCase.trim().toString
    var nTokens = 0L
    var sumLen = 0L
    var nStop = 0L
    if (s.isEmpty) {
      nTokens = 1L // "".split("\\s+", -1) == Array("")
    } else {
      val n = s.length
      if (isSpace(s.charAt(0))) nTokens += 1 // leading empty element
      var i = 0
      while (i < n) {
        if (isSpace(s.charAt(i))) i += 1
        else {
          val start = i
          var cp = 0L
          while (i < n && !isSpace(s.charAt(i))) {
            cp += 1
            i += Character.charCount(s.codePointAt(i))
          }
          nTokens += 1
          sumLen += cp
          if (stops.contains(s.substring(start, i))) nStop += 1
        }
      }
      if (isSpace(s.charAt(n - 1))) nTokens += 1 // trailing empty element
    }
    val o = text.toString
    var nPunct = 0L
    var j = 0
    while (j < o.length) {
      val c = o.codePointAt(j)
      j += Character.charCount(c)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      if (!alnum && !(c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'))
        nPunct += 1
    }
    new GenericInternalRow(Array[Any](nTokens, sumLen, nStop, nPunct))
  }
}

case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a string column, got $other")
  }

  override def dataType: DataType = TextStats.schema

  private lazy val helper = new TextStatsHelper(stopwords.toArray)

  override def nullSafeEval(input: Any): Any =
    helper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("textStatsHelper", helper, classOf[TextStatsHelper].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $h.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))

  /** Column-API entry point. */
  def stats(text: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(text), stopwords))
}
