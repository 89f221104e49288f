package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl ingestion — the step between the
  * container walks (WARC x117, gzip x118, composed ingest x121) and every
  * text operator in the catalog: real crawl pipelines feed dedup/quality/
  * tokenization with the EXTRACTED text, not raw markup.
  *
  * The pipeline (each stage a codegen'd `regexp_replace` — no UDF):
  *   1. comments          `<!-- … -->`                     → one space
  *   2. script/style      `<script…>…</script>` (dotall,
  *      case-insensitive; non-greedy so quoted markup
  *      inside code cannot eat the close tag)             → one space
  *   3. every remaining tag `<[^>]+>`                      → one space
  *   4. entity decode — the named set crawl text actually carries
  *      (`&nbsp; &lt; &gt; &quot; &#39; &amp;` — amp LAST, so
  *      `&amp;lt;` decodes to the literal `&lt;` and never resurrects
  *      a tag after stripping)
  *   5. whitespace collapse + trim
  *
  * Ordering contracts worth stating: entities decode AFTER tag
  * stripping, so text that SPELLS a tag (`&lt;p&gt;`) survives as text;
  * attributes (including URLs with `&amp;`) vanish with their tag.
  * Out-of-scope by design: CDATA, conditional comments, malformed
  * attribute `>` inside quotes — a production extractor grows those the
  * same way (one more anchored replace each).
  */
object HtmlText {

  private val entityPairs: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Extracted, whitespace-normalized text of an HTML column. */
  def extract(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = entityPairs.foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(ent), ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The <title> content (first match), whitespace-normalized; empty
    * string when absent. */
  def title(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1), "\\s+", " "))
}
