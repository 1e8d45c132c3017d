package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StripHtmlSpec extends SparkTestBase {

  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h")
      .select(TextOps.stripHtml(col("h")).as("t"))
      .head().getString(0)

  test("drops head, script/style contents, comments and tags") {
    val html = "<html><head><title>ignored</title></head><body>" +
      "<script>if (a<b) { alert('x'); }</script>" +
      "<style>p { color: red; }</style>" +
      "<!-- <p>commented markup must not leak</p> -->" +
      "<p>hello <b>bold</b> world</p></body></html>"
    assert(strip(html) === "hello bold world")
  }

  test("entity unescape is single-pass: &amp;lt; is the LITERAL &lt;") {
    assert(strip("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>")
      === "a & b <tag> \"q\" 's'")
    assert(strip("<p>&amp;lt;</p>") === "&lt;")
  }

  test("whitespace collapses across removed block boundaries") {
    assert(strip("<div>one</div>\n\n  <div>two</div>") === "one two")
  }

  test("plain text passes through untouched") {
    assert(strip("no markup at all") === "no markup at all")
  }
}
