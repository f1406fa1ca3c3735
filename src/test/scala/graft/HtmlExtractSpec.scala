package graft

import org.apache.spark.sql.functions._
import graft.text.TextStats

/** extractHtml's strip/decode cascade: exact outputs on well-formed
  * HTML, the documented fallthrough semantics on broken HTML, and
  * no-throw determinism on hostile inputs (the CodecFuzzSpec posture:
  * a web crawl WILL contain every one of these). */
class HtmlExtractSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String*): Seq[String] =
    html.toDF("h").select(TextStats.extractHtml(col("h"))).collect()
      .map(_.getString(0)).toSeq

  test("strips comments, script, style, tags; decodes entities; collapses whitespace") {
    val got = extract(
      "<html><head><style>p{color:red}</style><script>if(a>0&&b<2){x()}" +
        "</script></head><body><!-- hidden --><h1>Hi</h1>\n\n " +
        "<p>one   two</p></body></html>",
      "<P CLASS=\"x\">Upper &amp; lower</P>",
      "a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e")
    assert(got == Seq(
      "Hi one two",
      "Upper & lower",
      "a <b> \"c\" 'd' e"))
  }

  test("multiline and case-insensitive blocks strip; decode runs after tag strip") {
    val got = extract(
      "<SCRIPT type=\"module\">\nlet s = \"</p>\";\n</SCRIPT>after",
      "<style\n media=\"print\">\n body { }\n</style >kept",
      // decoded &lt;b&gt; must SURVIVE as text (decode is post-strip)
      "&lt;script&gt;not code&lt;/script&gt;")
    assert(got == Seq("after", "kept", "<script>not code</script>"))
  }

  test("&amp; decodes last: &amp;lt; yields the literal entity, not <") {
    assert(extract("x &amp;lt; y") == Seq("x &lt; y"))
    assert(extract("&amp;amp;") == Seq("&amp;"))
  }

  test("documented fallthrough: unclosed script surfaces as text; quoted > ends a tag") {
    val got = extract(
      "<script>var a = 1; broken",  // no closing tag: body falls through
      "<a title=\"a>b\">link</a>")  // regex tag model cuts at the first >
    assert(got == Seq("var a = 1; broken", "b\">link"))
  }

  test("hostile inputs never throw and are deterministic") {
    val hostile = Seq(
      "", "<", ">", "<>", "<<<>>>", "<!---->", "<!-- <script> -->",
      "<script></script><script></script>", "&", "&amp", "&#xZZ;",
      "<script><!-- --></script>x", "plain text, no markup at all",
      "<div" + " x" * 1000 + ">deep attrs</div>",
      "nested <div><div><div>text</div></div></div>")
    val once = extract(hostile: _*)
    val twice = extract(hostile: _*)
    assert(once == twice)
    assert(once(12).startsWith("plain text"))
    assert(once.last == "nested text")
  }
}
