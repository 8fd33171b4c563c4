package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the missing half of the crawl front door
  * (round-15 verdict item 1): raw crawl dumps are mostly WARC
  * `response` records carrying HTML, so a curation chain that can
  * only start from somebody else's WET conversion text cannot curate
  * a crawl corpus. (No reference counterpart; SURVEY.md §8 extension
  * surface.)
  *
  * Design: the fixMojibake device scaled up — ONE ordered step list
  * ([[Steps]]) generates BOTH the Spark scalar chain ([[htmlText]],
  * codegen'd `regexp_replace`/`replace`, one pass, no UDF) and the
  * DuckDB replay ([[htmlTextSql]]), so the two engines can never
  * drift. Every regex stays inside the Java-regex ∩ RE2 common
  * subset: inline `(?is)` flags, non-greedy quantifiers, explicit
  * whitespace classes instead of `\s` (Java's includes U+000B, RE2's
  * does not), `\A`/`\z` anchors instead of `^`/`$` (Java's `$`
  * matches before a trailing newline, RE2's does not), and no
  * lookaround/backreferences (RE2 has neither).
  *
  * Extraction semantics (the regex-extractor contract, shared with
  * every public crawl pipeline's fast path — trafilatura/jusText-
  * grade DOM analysis is out of scope by design):
  *
  *  1. comments drop (`foo<!--x-->bar` → `foobar`, as rendered);
  *     a commented-out script never executes, so it must not leak;
  *  2. `<script>`/`<style>` drop WITH their contents, honoring the
  *     HTML5 raw-text rule: the element ends at the first
  *     `</script`, so JS containing `a<b` or `"<p>"` cannot leak
  *     (and a `</script>` inside a JS string literal terminates the
  *     element — exactly what a browser does);
  *  3. block-level tags (`p`, `div`, `br`, `li`, headings, table
  *     rows, …) become a line break; inline tags vanish (`<b>a</b>c`
  *     → `ac`, as rendered). Attribute values may contain `>` only
  *     inside quotes (the HTML5 attribute rule) — the tag patterns
  *     are quote-aware, so `<div data-x="a>b">` is one tag;
  *  4. a stray `<` not opening a tag (`a < b`) is TEXT and survives
  *     (tags must start `<letter`, `</`, or `<!`);
  *  5. the common named/numeric entities decode, `&amp;` LAST so
  *     double-escapes resolve one level (`&amp;lt;` → `&lt;`), and
  *     the decode runs AFTER tag stripping so text-level
  *     `&lt;script&gt;` can never be removed as a script;
  *  6. whitespace normalizes: horizontal runs → one space, runs
  *     containing a newline → one newline, ends trimmed.
  */
object Html {

  /** One mirrored step: a regex replace (`re = true`, global in both
    * engines) or a literal replace. */
  final case class Step(pattern: String, replacement: String, re: Boolean)

  private def rx(p: String, r: String) = Step(p, r, re = true)
  private def litStep(a: String, b: String) = Step(a, b, re = false)

  /** Quote-aware tag interior: attribute values may hide `>` inside
    * single or double quotes. */
  private val TagBody = """(?:"[^"]*"|'[^']*'|[^>])*"""

  /** Tags whose end (or start) breaks the text line — the HTML block
    * boxes plus explicit breaks. */
  private val BlockTags = Seq(
    "br", "p", "div", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td", "th",
    "table", "thead", "tbody", "caption", "blockquote", "pre",
    "section", "article", "aside", "header", "footer", "nav",
    "figure", "figcaption", "form", "fieldset", "hr", "title")

  /** The ordered extraction chain. Order is load-bearing: comments
    * before scripts (a commented-out script is a comment), raw-text
    * elements before generic tags (or their contents leak), entity
    * decode after tags (text-level `&lt;script&gt;` stays text) and
    * before whitespace (`&nbsp;` must collapse), `&amp;` last of the
    * entities, trim last of all. */
  val Steps: Seq[Step] = Seq(
    rx("(?s)<!--.*?-->", ""),
    rx(s"(?is)<script\\b$TagBody>.*?</script[ \\t\\r\\n]*>", "\n"),
    rx(s"(?is)<style\\b$TagBody>.*?</style[ \\t\\r\\n]*>", "\n"),
    rx(s"(?is)</?(?:${BlockTags.mkString("|")})\\b$TagBody>", "\n"),
    rx(s"(?s)</?[A-Za-z!]$TagBody>", "")) ++ Seq(
    "&nbsp;" -> " ", "&#160;" -> " ",
    "&lt;" -> "<", "&#60;" -> "<", "&gt;" -> ">", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'",
    "&ndash;" -> "–", "&mdash;" -> "—", "&hellip;" -> "…",
    "&lsquo;" -> "‘", "&rsquo;" -> "’",
    "&ldquo;" -> "“", "&rdquo;" -> "”",
    "&middot;" -> "·", "&copy;" -> "©", "&reg;" -> "®",
    // the ampersand forms decode LAST (decoding "&#38;lt;" early
    // would mint an "&lt;" the earlier steps have already passed —
    // a double decode; kept one-level like "&amp;")
    "&amp;" -> "&", "&#38;" -> "&").map { case (a, b) =>
      litStep(a, b) } ++ Seq(
    rx("[ \\t\\r\\f]+", " "),
    rx("[ ]*\\n[ \\n]*", "\n"),
    rx("\\A[ \\n]+", ""),
    rx("[ \\n]+\\z", ""))

  /** Extracted text of an HTML column — one codegen'd scalar chain,
    * replayed step-for-step by [[htmlTextSql]]. */
  def htmlText(html: Column): Column =
    Steps.foldLeft(html) {
      case (c, Step(p, r, true))  => regexp_replace(c, p, r)
      case (c, Step(a, b, false)) => replace(c, lit(a), lit(b))
    }

  /** The DuckDB replay of [[htmlText]] over a SQL expression —
    * generated from the SAME step list, so the two engines cannot
    * drift. Newlines in replacements render as `chr(10)` (portable
    * across SQL literal dialects). */
  def htmlTextSql(colExpr: String): String =
    Steps.foldLeft(colExpr) {
      case (e, Step(p, r, true)) =>
        s"regexp_replace($e, ${sqlStr(p)}, ${sqlStr(r)}, 'g')"
      case (e, Step(a, b, false)) =>
        s"replace($e, ${sqlStr(a)}, ${sqlStr(b)})"
    }

  /** Anchor-href extraction pattern, shared VERBATIM by both engines
    * (Java-regex ∩ RE2: quote-aware lazy tag interior, no lookaround/
    * backrefs — the quote kinds need not match, which RE2 could not
    * express anyway). Quoted values only: HTML5 allows unquoted
    * hrefs, but crawl reality is overwhelmingly quoted and an
    * unquoted-value grammar would need boundary lookahead. An href
    * hiding inside ANOTHER attribute's quoted value is skipped by
    * both engines (the interior consumes quoted strings atomically
    * before character-by-character fallback — alternation priority,
    * identical in Java regex and RE2's leftmost-first mode). */
  val HrefPattern: String =
    """(?is)<a\b(?:"[^"]*"|'[^']*'|[^>])*?href[ \t\r\n]*=[ \t\r\n]*["']([^"']+)["']"""

  /** Outlink extraction — the crawl-frontier / web-graph half of the
    * front door: the href values of a page's anchor tags, in document
    * order (compose with [[Text.canonicalUrl]] for URL-level dedup
    * keys and with the graph ops for link analysis). Codegen'd
    * regexp_extract_all; replay with [[linksSql]]. */
  def links(html: Column): Column =
    regexp_extract_all(html, lit(HrefPattern), lit(1))

  /** The DuckDB replay of [[links]] — the same pattern string. */
  def linksSql(colExpr: String): String =
    s"regexp_extract_all($colExpr, ${sqlStr(HrefPattern)}, 1)"

  /** A SQL string literal: quotes doubled; newlines spliced as
    * chr(10) so the generated SQL stays one logical line. */
  private def sqlStr(s: String): String = {
    val parts = s.split("\n", -1).toSeq
    val rendered = parts.zipWithIndex.flatMap { case (p, i) =>
      (if (i > 0) Seq("chr(10)") else Nil) ++
        (if (p.isEmpty) Nil
         else Seq("'" + p.replace("'", "''") + "'"))
    }
    if (rendered.isEmpty) "''" else rendered.mkString(" || ")
  }
}
