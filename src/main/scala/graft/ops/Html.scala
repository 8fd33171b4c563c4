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

  private def fold(steps: Seq[Step], html: Column): Column =
    steps.foldLeft(html) {
      case (c, Step(p, r, true))  => regexp_replace(c, p, r)
      case (c, Step(a, b, false)) => replace(c, lit(a), lit(b))
    }

  private def foldSql(steps: Seq[Step], colExpr: String): String =
    steps.foldLeft(colExpr) {
      case (e, Step(p, r, true)) =>
        s"regexp_replace($e, ${sqlStr(p)}, ${sqlStr(r)}, 'g')"
      case (e, Step(a, b, false)) =>
        s"replace($e, ${sqlStr(a)}, ${sqlStr(b)})"
    }

  /** Extracted text of an HTML column — one codegen'd scalar chain,
    * replayed step-for-step by [[htmlTextSql]]. */
  def htmlText(html: Column): Column = fold(Steps, html)

  /** The DuckDB replay of [[htmlText]] over a SQL expression —
    * generated from the SAME step list, so the two engines cannot
    * drift. Newlines in replacements render as `chr(10)` (portable
    * across SQL literal dialects). */
  def htmlTextSql(colExpr: String): String = foldSql(Steps, colExpr)

  /** [[Steps]] with anchor marking spliced in before the generic tag
    * strip: `<a …>` becomes U+0001 and `</a>` U+0002, so the
    * extracted text still knows which characters were LINK TEXT —
    * the signal jusText-style block classification needs and plain
    * [[htmlText]] destroys. The sentinels are control characters no
    * sane document contains; both engines render them as chr(1)/
    * chr(2). An anchor torn across a block boundary counts only its
    * same-line span (regex-extractor grade, like the rest of this
    * module — see the trafilatura-out-of-scope note above).
    * `MarkOpen`/`MarkClose` are the sentinels. */
  val MarkOpen = "\u0001"
  val MarkClose = "\u0002"

  val MarkedSteps: Seq[Step] = Steps.take(4) ++ Seq(
    rx(s"(?is)<a\\b$TagBody>", MarkOpen),
    rx("(?is)</a[ \\t\\r\\n]*>", MarkClose)) ++ Steps.drop(4)

  /** [[htmlText]] with link-text sentinels kept — feed
    * [[blockScores]]. */
  def htmlTextMarked(html: Column): Column = fold(MarkedSteps, html)

  /** The DuckDB replay of [[htmlTextMarked]]. */
  def htmlTextMarkedSql(colExpr: String): String =
    foldSql(MarkedSteps, colExpr)

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

  // ===== jusText-grade block classification (round-17) =====

  /** Per-block content/boilerplate classification — the context-free
    * core of jusText (Pomikálek 2011): split the MARKED extracted
    * text ([[htmlTextMarked]]) into blocks at the line breaks the tag
    * pass emits, score each block on the exact ppm grid — link
    * density (sentinel-marked chars over chars) and stopword density
    * (stopword tokens over tokens) — and keep blocks that are long
    * enough (`minChars`, jusText's length_low 70), link-poor
    * (`maxLinkPpm`, jusText's max_link_density 0.2), and
    * stopword-rich (`minStopPpm`; jusText's stopwords_low 0.30
    * assumes a full several-hundred-word stopword list — callers
    * with seed-sized lists pass a proportionally lower gate).
    * Deliberately omitted from full jusText: the near-good context
    * propagation pass (a context-free gate keeps the scoring ONE
    * scalar pass, mirrored in SQL by [[blockScoresSql]]).
    *
    * Scale shape: split → posexplode → scalar scoring is a map-only
    * stage — no shuffle, whatever the corpus size; blocks stay inside
    * whole-stage codegen.
    *
    * @param df  input frame
    * @param id  passthrough id column NAME
    * @param marked marked text column (from [[htmlTextMarked]])
    * @return (id, block_idx, block, n_chars, n_words, link_ppm,
    *         stop_ppm, keep) — one row per non-empty block
    */
  def blockScores(df: org.apache.spark.sql.DataFrame, id: String,
      marked: Column, stops: Seq[String], minChars: Int = 70,
      maxLinkPpm: Long = 200000L, minStopPpm: Long = 300000L)
      : org.apache.spark.sql.DataFrame = {
    val stopsArr = array(stops.map(lit): _*)
    val clean = replace(replace(col("__mb"), lit(MarkOpen), lit("")),
      lit(MarkClose), lit(""))
    // link chars: pieces after each MarkOpen contribute their prefix
    // up to the matching MarkClose; an unclosed mark (anchor torn
    // across a block boundary) contributes nothing — same rule in SQL
    val pieces = split(col("__mb"), MarkOpen, -1)
    val linkChars = aggregate(
      slice(pieces, lit(2), size(pieces) - 1), lit(0L),
      (acc, p) => acc + when(instr(p, MarkClose) > 0,
        length(substring_index(p, MarkClose, 1)).cast("long"))
        .otherwise(0L))
    val w = filter(split(col("block"), " "), x => length(x) > 0)
    df.select(col(id),
        posexplode(split(marked, "\n")).as(Seq("block_idx", "__mb")))
      .withColumn("block", clean)
      .filter(length(col("block")) > 0)
      .withColumn("__lc", linkChars)
      .withColumn("n_chars", length(col("block")).cast("long"))
      .withColumn("n_words", size(w).cast("long"))
      .withColumn("__sh",
        size(filter(w, x => array_contains(stopsArr, lower(x))))
          .cast("long"))
      .withColumn("link_ppm",
        expr("__lc * 1000000L div greatest(n_chars, 1L)"))
      .withColumn("stop_ppm",
        expr("__sh * 1000000L div greatest(n_words, 1L)"))
      .withColumn("keep",
        col("n_chars") >= minChars && col("link_ppm") <= maxLinkPpm &&
          col("stop_ppm") >= minStopPpm)
      .select(col(id), col("block_idx").cast("long").as("block_idx"),
        col("block"), col("n_chars"), col("n_words"), col("link_ppm"),
        col("stop_ppm"), col("keep"))
  }

  /** The DuckDB replay of [[blockScores]] over a `(idCol, htmlExpr)`
    * source subquery — the marked-step chain, the split device, and
    * the same ppm thresholds, generated from the SAME constants. */
  def blockScoresSql(srcSql: String, idCol: String, htmlExpr: String,
      stops: Seq[String], minChars: Int = 70,
      maxLinkPpm: Long = 200000L, minStopPpm: Long = 300000L): String = {
    val stopsLit = stops.map(x => "'" + x.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH __src AS ($srcSql),
       |__m AS (SELECT $idCol AS __bs_id,
       |  ${htmlTextMarkedSql(htmlExpr)} AS mt FROM __src),
       |__bx AS (
       |  SELECT __bs_id,
       |    unnest(range(len(string_split(mt, chr(10))))) AS block_idx,
       |    unnest(string_split(mt, chr(10))) AS mb
       |  FROM __m),
       |__c AS (
       |  SELECT __bs_id, block_idx,
       |    replace(replace(mb, chr(1), ''), chr(2), '') AS block,
       |    coalesce(list_sum(list_transform(
       |      (string_split(mb, chr(1)))[2:],
       |      p -> CASE WHEN strpos(p, chr(2)) > 0
       |           THEN length(split_part(p, chr(2), 1)) ELSE 0 END)),
       |      0)::BIGINT AS __lc
       |  FROM __bx),
       |__s AS (
       |  SELECT __bs_id, block_idx, block, __lc,
       |    length(block)::BIGINT AS n_chars,
       |    list_filter(string_split(block, ' '), x -> length(x) > 0)
       |      AS __w
       |  FROM __c WHERE length(block) > 0),
       |__p AS (
       |  SELECT __bs_id, block_idx, block, n_chars,
       |    len(__w)::BIGINT AS n_words,
       |    (__lc * 1000000 // greatest(n_chars, 1))::BIGINT AS link_ppm,
       |    (len(list_filter(__w, x -> list_contains($stopsLit,
       |        lower(x)))) * 1000000
       |      // greatest(len(__w), 1))::BIGINT AS stop_ppm
       |  FROM __s)
       |SELECT __bs_id AS $idCol, block_idx::BIGINT AS block_idx, block,
       |  n_chars, n_words, link_ppm, stop_ppm,
       |  (n_chars >= $minChars AND link_ppm <= $maxLinkPpm
       |    AND stop_ppm >= $minStopPpm) AS keep
       |FROM __p""".stripMargin
  }

  /** A SQL string literal: quotes doubled; control characters
    * (newlines, the link sentinels) spliced as chr(n) so the
    * generated SQL stays one printable logical line. */
  private def sqlStr(s: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      out += "'" + run.toString.replace("'", "''") + "'"
      run.clear(): Unit
    }
    s.foreach { ch =>
      if (ch < 0x20) { flush(); out += s"chr(${ch.toInt})" }
      else run.append(ch): Unit
    }
    flush()
    if (out.isEmpty) "''" else out.mkString(" || ")
  }
}
