package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HtmlText vs hand-computed extractions — each test pins one ordering
  * contract of the five-stage pipeline. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def ex(h: String): String =
    Seq(h).toDF("h").select(HtmlText.extract(col("h"))).first().getString(0)
  private def ti(h: String): String =
    Seq(h).toDF("h").select(HtmlText.title(col("h"))).first().getString(0)

  test("script body with quoted markup inside is removed as ONE block") {
    // a greedy (or tag-stripping-first) implementation would leak
    // 'not text' into the output
    assert(ex("<p>a</p><script>var x = '<p>not text</p>';</script><p>b</p>")
      == "a b")
  }

  test("style body containing '>' is removed as one block") {
    assert(ex("<style>.c > div { color: red; }</style>hello") == "hello")
  }

  test("case-insensitive block tags; newlines inside blocks") {
    assert(ex("<SCRIPT>\nvar y = 2;\n</sCrIpT>ok<STYLE>\nh1{}\n</style>!")
      == "ok !")
  }

  test("comments removed, including ones containing tags") {
    assert(ex("x<!-- <p>hidden</p> -->y") == "x y")
  }

  test("entities decode AFTER tag stripping — entity-spelled tags survive as text") {
    assert(ex("<p>&lt;p&gt;literal&lt;/p&gt;</p>") == "<p>literal</p>")
    // double-encoded &amp;lt; decodes to the literal text '&lt;' (amp is
    // processed LAST, so it cannot resurrect an entity or a tag)
    assert(ex("a &amp;lt; b") == "a &lt; b")
  }

  test("attributes vanish with their tag, including entities in URLs") {
    assert(ex("<a href=\"http://e/?a=1&amp;b=2\">link</a>") == "link")
  }

  test("nbsp becomes a space and collapses with neighbors; trim applies") {
    assert(ex("  a&nbsp;&nbsp;b   c\t\nd  ") == "a b c d")
    assert(ex("&quot;q&quot; &#39;s") == "\"q\" 's")
  }

  test("title extraction is first-match, normalized; absent title is empty") {
    assert(ti("<html><TITLE> a  b </TITLE><title>z</title></html>") == "a b")
    assert(ti("<html><body>no title</body></html>") == "")
  }
}
