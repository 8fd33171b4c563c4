package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.htmlText(col("h"))).as[String].head()

  test("a full adversarial page: comments, script with angle " +
      "brackets, style, quoted '>' in attributes, entities, block " +
      "breaks — extracts exactly the rendered text") {
    val html =
      """<html><head><title>Doc 1</title>
        |<meta charset="utf-8"><!-- hidden <script>alert(1)</script> -->
        |<script type="text/javascript">if (a<b && c>d) { emit("<p>x</p>"); }</script>
        |<style>p > .x { color: red; }</style></head>
        |<body><h1>Title &amp; more</h1>
        |<p>first   paragraph</p><p>second<b>bold</b>tail</p>
        |<div class="foot" data-x="a>b">&copy; 2026 &lt;graft&gt;&nbsp;corp</div>
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "Doc 1\nTitle & more\nfirst paragraph\nsecondboldtail\n© 2026 <graft> corp")
  }

  test("HTML5 raw-text rule: script/style contents never leak, even " +
      "quoting tags; a '</script>' inside a JS string terminates the " +
      "element exactly as a browser would") {
    assert(extract("""a<script>var s = "<p>not text</p>";</script>b""")
      == "a\nb")
    assert(extract("""<style>div { content: "<li>x"; }</style>kept""")
      == "kept")
    // the spec-mandated early termination: text after the in-string
    // </script> is OUTSIDE the element (a browser renders it too);
    // the orphaned closing tag then strips as a plain tag
    assert(extract("""<script>var s = "</script>";</script>rest""")
      == "\";rest")
  }

  test("comments drop without inserting space; commented-out markup " +
      "never extracts") {
    assert(extract("foo<!-- x -->bar") == "foobar")
    assert(extract("a<!-- <p>ghost</p> <script>x</script> -->b") == "ab")
    assert(extract("<!--\nmultiline\ncomment\n-->text") == "text")
  }

  test("stray '<' is text (a < b survives); tags must open with a " +
      "letter, '/', or '!'") {
    assert(extract("a < b and c > d") == "a < b and c > d")
    assert(extract("x <3 y") == "x <3 y")
    assert(extract("<!DOCTYPE html><p>t</p>") == "t")
  }

  test("entity decode: one level of double-escape (&amp;lt; stays " +
      "&lt; as text), decode AFTER tag strip so text-level " +
      "&lt;script&gt; survives as text") {
    assert(extract("&amp;lt;never a tag&amp;gt;") == "&lt;never a tag&gt;")
    assert(extract("see &lt;script&gt;alert&lt;/script&gt; quoted")
      == "see <script>alert</script> quoted")
    assert(extract("&ldquo;q&rdquo; &ndash; &hellip; &#39;a&#39;")
      == "“q” – … 'a'")
    // common numeric forms, and the numeric ampersand decodes one
    // level exactly like &amp; (&#38;lt; is the TEXT "&lt;")
    assert(extract("a&#60;b&#62;c&#160;d &#x27;e&#x27;")
      == "a<b>c d 'e'")
    assert(extract("&#38;lt;kept&#38;gt;") == "&lt;kept&gt;")
  }

  test("block tags break lines, inline tags vanish, whitespace " +
      "normalizes (runs collapse, ends trim)") {
    assert(extract("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    assert(extract("line a<br>line b<br/>line c") ==
      "line a\nline b\nline c")
    assert(extract("  <p>  padded   text  </p>  ") == "padded text")
    assert(extract("<em>in</em>line <span>spans</span> join") ==
      "inline spans join")
    assert(extract("<td>r1c1</td><td>r1c2</td>") == "r1c1\nr1c2")
  }

  test("quote-aware tag interiors: '>' inside a quoted attribute " +
      "does not end the tag (both quote kinds)") {
    assert(extract("""<div data-x="a>b">kept</div>""") == "kept")
    assert(extract("""<a href='x>y' title="p>q">link</a> text""")
      == "link text")
  }

  test("links: hrefs extract in document order, both quote kinds, " +
      "attribute order and case insensitive; an href inside another " +
      "attribute's value or an anchor without one is skipped") {
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(Html.links(col("h")))
        .as[Seq[String]].head()
    assert(links(
      """<a href="http://a/1">x</a> text <A CLASS="c" HREF='http://a/2'>y</A>""")
      == Seq("http://a/1", "http://a/2"))
    assert(links("""<a title="href='http://fake/'" href="http://real/">z</a>""")
      == Seq("http://real/"))
    assert(links("""<a name="anchor">no link</a> <p>plain</p>""")
      == Seq.empty)
    assert(links("""<a
      |  href = "http://spread/over/lines">w</a>""".stripMargin)
      == Seq("http://spread/over/lines"))
  }

  test("property: plain text wrapped in block tags survives " +
      "extraction exactly (up to whitespace normalization) — 200 " +
      "random entity-free bodies") {
    val rnd = new scala.util.Random(16)
    val alphabet = "abc XYZ 09._,:;!? -"
    (1 to 200).foreach { _ =>
      val body = Seq.fill(rnd.nextInt(40) + 1)(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val want = body.replaceAll("[ ]+", " ").trim
      val got = extract(s"<div><p>$body</p></div>")
      assert(got == want, s"body '$body' extracted as '$got'")
    }
  }

  test("htmlTextSql mirrors the step list: one regexp_replace or " +
      "replace per step, newline replacements rendered as chr(10), " +
      "single quotes doubled") {
    val sql = Html.htmlTextSql("t")
    assert(sql.contains("chr(10)"))
    assert("regexp_replace".r.findAllIn(sql).size ==
      Html.Steps.count(_.re))
    assert("(?<!regexp_)replace\\(".r.findAllIn(sql).size ==
      Html.Steps.count(!_.re))
    // the quote-aware tag pattern survives SQL quoting (its single
    // quotes are doubled, not truncated)
    assert(sql.contains("''[^'']*''"))
  }

  // ===== block classification (round 17) =====

  test("htmlTextMarked keeps link-text sentinels; blockScores gates " +
      "each boilerplate class on its own signal") {
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        "<h1>Short</h1>" +
        "<p>" + ("the quick brown fox jumps over a lazy dog and " * 4) +
        "it is that good for everyone involved here</p>" +
        "<footer><a href=\"/t\">Terms of Service</a> and " +
        "<a href=\"/p\">Privacy</a></footer></body></html>"
    val df = Seq((1L, html)).toDF("id", "h")
      .withColumn("mt", Html.htmlTextMarked(col("h")))
    // sentinels present in the marked text, absent from htmlText
    val mt = df.select("mt").as[String].head()
    assert(mt.contains(Html.MarkOpen) && mt.contains(Html.MarkClose))
    assert(!df.select(Html.htmlText(col("h"))).as[String].head()
      .contains(Html.MarkOpen))
    val got = Html.blockScores(df, "id", col("mt"),
        Text.StopwordSeeds("en"), minStopPpm = 20000L)
      .select("block_idx", "block", "link_ppm", "stop_ppm", "n_chars",
        "keep")
      .collect().sortBy(_.getLong(0))
    assert(got.length == 4, got.mkString("; "))
    val nav = got(0); val h1 = got(1); val content = got(2)
    val foot = got(3)
    assert(nav.getString(1) == "Home About")
    assert(nav.getLong(2) > 200000L && !nav.getBoolean(5),
      "nav must fail the link gate")
    assert(h1.getLong(4) < 70L && !h1.getBoolean(5),
      "heading must fail the length gate")
    assert(content.getLong(2) == 0L && content.getBoolean(5),
      "prose must keep")
    assert(!foot.getBoolean(5), "footer must fail the link gate")
    // footer link chars: 'Terms of Service' (16) + 'Privacy' (7) over
    // the clean 'Terms of Service and Privacy' (28)
    assert(foot.getLong(2) == 23L * 1000000L / 28L, foot.toString)
  }

  test("blockScores: an anchor torn across a block boundary counts " +
      "only closed same-line spans; empty blocks drop") {
    val html = "<p><a href=\"/x\">left<div>right</a> tail</div></p>"
    val df = Seq((1L, html)).toDF("id", "h")
      .withColumn("mt", Html.htmlTextMarked(col("h")))
    val got = Html.blockScores(df, "id", col("mt"),
        Text.StopwordSeeds("en"))
      .select("block", "link_ppm").as[(String, Long)].collect().toMap
    // 'left' has an unclosed mark → 0 link chars; 'right tail' has a
    // closing mark with no opener on its line → 0 as well
    assert(got("left") == 0L, got.toString)
    assert(got("right tail") == 0L, got.toString)
  }
}
