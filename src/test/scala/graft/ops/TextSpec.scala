package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).get(0)

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getSeq[String](0).toSeq

  // ---- winnowing fingerprints (Schleimer et al. SIGMOD'03) ----

  private def winnowOf(text: String, k: Int = 8, w: Int = 4): Seq[Long] =
    Text.winnowFingerprints(
        Seq((1L, text)).toDF("id", "t"), "id", col("t"), k, w)
      .select(col("fingerprints"))
      .collect()(0).getSeq[Long](0).toSeq

  /** Reference gram hash: first 15 hex chars of md5, base 16 → long
    * (the engine's cross-engine draw device, recomputed independently). */
  private def gramHash(g: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("winnowing guarantee: a shared substring of >= w+k-1 chars " +
      "shares a fingerprint") {
    // k=8, w=4 -> any 11-char shared run must contribute a shared print
    val shared = "sharedrunofchars"
    val a = winnowOf(s"xxxxxx $shared yyyy")
    val b = winnowOf(s"qqq $shared zzzzzzzz")
    assert(a.toSet.intersect(b.toSet).nonEmpty,
      "docs sharing a long substring must share a selected fingerprint")
  }

  test("winnowing: no shared 8-gram, no shared fingerprint") {
    val a = winnowOf("aaaaaaaaaaaaaaaa")
    val b = winnowOf("bbbbbbbbbbbbbbbb")
    assert(a.toSet.intersect(b.toSet).isEmpty)
  }

  test("winnowing edges: short docs select nothing; few-gram docs " +
      "select the global minimum") {
    assert(winnowOf("abcdefg").isEmpty) // 7 chars < k=8
    // exactly one gram -> its hash is the single selected print
    assert(winnowOf("abcdefgh") == Seq(gramHash("abcdefgh")))
    // 3 grams (<= w=4) -> single global min
    val grams = Seq("abcdefgh", "bcdefghi", "cdefghij")
    assert(winnowOf("abcdefghij") == Seq(grams.map(gramHash).min))
  }

  test("winnowing selects a sorted distinct subset denser than 1 but " +
      "sparser than all grams") {
    val rnd = new scala.util.Random(11)
    val doc = (1 to 60).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .grouped(6).map(_.mkString).mkString(" ")
    val fps = winnowOf(doc)
    val nGrams = doc.length - 7
    assert(fps.nonEmpty && fps.length < nGrams)
    assert(fps == fps.sorted && fps.distinct == fps)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    assert(one(Text.normalize(col("t")), "  Héllo,   WORLD!!  42 ")
      == "h llo world 42")
    assert(one(Text.normalize(col("t")), "...") == "")
  }

  test("tokenCount counts whitespace tokens") {
    assert(one(Text.tokenCount(col("t")), "a b  c\td") == 4L)
    assert(one(Text.tokenCount(col("t")), "one") == 1L)
  }

  test("regexTokens splits words, numbers, and symbols") {
    assert(oneSeq(Text.regexTokens(col("t")), "ab 12,c!")
      == Seq("ab", "12", ",", "c", "!"))
  }

  test("shingles yields n-grams; short docs yield empty") {
    assert(oneSeq(Text.shingles(col("t"), 3), "a b c d")
      == Seq("a b c", "b c d"))
    assert(oneSeq(Text.shingles(col("t"), 3), "a b").isEmpty)
  }

  test("charShingles yields char n-grams of normalized text") {
    assert(oneSeq(Text.charShingles(col("t"), 3), "abcd")
      == Seq("abc", "bcd"))
  }

  test("langId picks stopword-argmax, und when no hits") {
    assert(one(Text.langId(col("t")), "the cat of the house is it") == "en")
    assert(one(Text.langId(col("t")), "le chat de la maison et les chiens")
      == "fr")
    assert(one(Text.langId(col("t")), "der hund und die katze ist von den")
      == "de")
    assert(one(Text.langId(col("t")), "qqqq zzzz") == "und")
  }

  test("qualityScore is in [0,1] and rewards clean prose") {
    val good = one(Text.qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog and runs away")
      .asInstanceOf[Double]
    val bad = one(Text.qualityScore(col("t")), "!!!! ???? ....")
      .asInstanceOf[Double]
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("repetition ratios flag duplicated content") {
    val loop = one(Text.dupWordRatio(col("t")), "spam spam spam spam")
      .asInstanceOf[Double]
    val clean = one(Text.dupWordRatio(col("t")), "all words are unique here")
      .asInstanceOf[Double]
    assert(loop == 0.75 && clean == 0.0)
    val tri = one(Text.dupShingleRatio(col("t"), 3), "a b c a b c a b c")
      .asInstanceOf[Double]
    assert(tri > 0.5) // "a b c" trigram repeats
    assert(one(Text.dupShingleRatio(col("t"), 3), "a b")
      .asInstanceOf[Double] == 0.0) // too short → no shingles → 0
  }

  test("compressionRatios: repetitive text compresses far below noise") {
    val docs = Seq(
      (1L, "lorem ipsum " * 500),                  // boilerplate loop
      (2L, scala.util.Random.javaRandomToRandom(   // fixed-seed noise
        new java.util.Random(99)).alphanumeric.take(6000).mkString),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Text.compressionRatios(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.05, s"boilerplate ratio ${got(1L)}")
    assert(got(2L) > 0.5, s"noise ratio ${got(2L)}")
    assert(got(3L) == 0.0 && got(4L) == 0.0)
    // deterministic (golden-snapshot safety)
    val again = Text.compressionRatios(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(again == got)
  }

  test("dropRepeatedSpans cuts cross-doc repeated spans, keeps unique text") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one tail"),
      (2L, "prefix words alpha beta gamma delta epsilon zeta other end"),
      (3L, "totally different content with no repeats at all ok"),
      (4L, "short doc")). // shorter than k: passes through whole
      toDF("doc_id", "text")
    val got = Text.dropRepeatedSpans(docs, "doc_id", "text", k = 6)
      .as[(Long, String)].collect().toMap
    // the shared 6-token span is cut from BOTH documents; everything
    // else survives in order
    assert(got(1L) == "unique one tail")
    assert(got(2L) == "prefix words other end")
    assert(got(3L) == "totally different content with no repeats at all ok")
    assert(got(4L) == "short doc")
  }

  test("dropRepeatedSpans catches WITHIN-doc repetition too") {
    val docs = Seq(
      (1L, "x1 x2 x3 x1 x2 x3"), // the 3-gram 'x1 x2 x3' occurs twice
      (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Text.dropRepeatedSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "") // every position covered by a repeated gram
    assert(got(2L) == "a b c d e")
  }

  test("fingerprints are deterministic and normalization-invariant") {
    val fp1 = one(Text.fingerprintMd5(col("t")), "Hello,  World!")
    val fp2 = one(Text.fingerprintMd5(col("t")), "hello world")
    assert(fp1 == fp2)
    val r1 = one(Text.fingerprintRolling(col("t")), "Hello,  World!")
    val r2 = one(Text.fingerprintRolling(col("t")), "hello world")
    val r3 = one(Text.fingerprintRolling(col("t")), "world hello")
    assert(r1 == r2 && r1 != r3) // order-sensitive, punctuation-invariant
  }

  test("confusableSkeleton folds homoglyphs and strips zero-width " +
    "so evasive re-posts fingerprint identically") {
    def skel(s: String) =
      one(Text.confusableSkeleton(col("t")), s).asInstanceOf[String]
    // Cyrillic 'о','е','а' for Latin — the classic dedup-evasion trick
    assert(skel("hеllо wоrld") == "hello world")
    // Greek omicron + zero-width joiner padding
    assert(skel("w​οrd‍") == "word")
    // typographic punctuation folds to ASCII
    assert(skel("it’s — “fine”") == "it's - \"fine\"")
    // plain ASCII is a fixed point
    assert(skel("already clean 123") == "already clean 123")
    // end-to-end: the evasive copy hashes like the original
    val a = one(md5(Text.normalize(Text.confusableSkeleton(col("t")))),
      "The quick brown fox")
    val b = one(md5(Text.normalize(Text.confusableSkeleton(col("t")))),
      "Thе quick brоwn fоx​") // Cyrillic е/о + zero-width tail
    assert(a == b)
    // the from/to tables must stay codepoint-aligned
    assert(Text.ConfusablePairs.map(_._1).mkString.length ==
      Text.ConfusablePairs.map(_._2).mkString.length)
  }

  test("redactPii scrubs emails, IPs, phones, and long ids in order") {
    def red(s: String): String =
      one(Text.redactPii(col("t")), s).asInstanceOf[String]
    assert(red("mail a.b+c@x-y.co.uk now") == "mail <EMAIL> now")
    assert(red("host 192.168.0.1 up") == "host <IP> up")
    assert(red("call +1 (514) 555-0199 now") == "call <PHONE> now")
    assert(red("card 4111111111111111.") == "card <NUM>.")
    // order: the IP is NOT re-matched as a phone-shaped digit run, and
    // an email's host digits are not re-matched as numbers
    assert(red("9.9.9.9") == "<IP>")
    assert(red("x123456789@mail99.com") == "<EMAIL>")
    // clean text passes through byte-identical
    val clean = "no pii here, just 42 words and v1.2 versions"
    assert(red(clean) == clean)
    // a spaced digit run never swallows a newline (literal-space class)
    assert(red("a 12 34 56 78 b\n90 12 34 56 c")
      == "a <PHONE> b\n<PHONE> c")
  }

  test("url parts: scheme/host/path/query/domain; malformed yields empties") {
    def parts(u: String): (String, String, String, String, String) = (
      one(Text.urlScheme(col("t")), u).asInstanceOf[String],
      one(Text.urlHost(col("t")), u).asInstanceOf[String],
      one(Text.urlPath(col("t")), u).asInstanceOf[String],
      one(Text.urlQuery(col("t")), u).asInstanceOf[String],
      one(Text.urlDomain(col("t")), u).asInstanceOf[String])
    assert(parts("https://a.b.example.com/x/y?q=1&r=2")
      == ("https", "a.b.example.com", "/x/y", "q=1&r=2", "example.com"))
    assert(parts("http://host.io") == ("http", "host.io", "", "", "host.io"))
    assert(parts("https://h.co:8080/p")
      == ("https", "h.co:8080", "/p", "", "h.co")) // port stays in host, not domain
    assert(parts("not a url") == ("", "", "", "", ""))
    // fragments are excluded from path and query
    assert(parts("https://x.org/a?b=c#frag")
      == ("https", "x.org", "/a", "b=c", "x.org"))
  }

  test("resolveEntities: exact dups + ED1 variants collapse to the " +
      "min-id golden record; unmatched rows stay singletons") {
    val df = Seq(
      (10L, "acme corp"), // cluster {10,11,12,13}: dup + ED1 chain
      (11L, "acme corp"),
      (12L, "acme corpx"),
      (13L, "acme cor"),
      (20L, "zenith"), // singleton
      (30L, "beta"), (31L, "betta"), // cluster {30,31}
      (40L, "wholly unrelated name")).toDF("id", "mention")
    val got = Text.resolveEntities(df, "id", "mention")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(got.size == 8)
    for (i <- Seq(10L, 11L, 12L, 13L))
      assert(got(i) == ((10L, "acme corp", 4L)), s"row $i")
    assert(got(20L) == ((20L, "zenith", 1L)))
    assert(got(30L) == ((30L, "beta", 2L)))
    assert(got(31L) == ((30L, "beta", 2L)))
    assert(got(40L) == ((40L, "wholly unrelated name", 1L)))
    // partition-independence: same labeling from a different layout
    val re = Text.resolveEntities(df.repartition(7), "id", "mention")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(re == got.map { case (k, v) => (k, v._1) })
  }

  test("boilerplateLines strips lines shared by >= minDocs docs of the " +
    "SAME group only, preserves order, and counts removals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "g1", "HEADER\nalpha\nFOOTER"),
      (2L, "g1", "HEADER\nbeta\nFOOTER"),
      (3L, "g1", "HEADER\ngamma\nHEADER\nFOOTER"), // repeated in-doc line
      // g2 shares the HEADER string but has only 2 docs < minDocs
      (4L, "g2", "HEADER\ndelta"),
      (5L, "g2", "HEADER\nepsilon")).toDF("id", "grp", "text")
    val got = Text.boilerplateLines(docs, "id", "grp", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (("alpha", 2L)))
    assert(got(2L) == (("beta", 2L)))
    // both HEADER occurrences in doc 3 are removed (3 removals total)
    assert(got(3L) == (("gamma", 3L)))
    // g2 is below threshold: untouched
    assert(got(4L) == (("HEADER\ndelta", 0L)))
    assert(got(5L) == (("HEADER\nepsilon", 0L)))
  }

  test("boilerplateLines: a fully-boilerplate doc reassembles to the " +
    "empty string, not null") {
    import spark.implicits._
    val docs = (1L to 4L).map(i => (i, "g", "SAME")).toDF("id", "grp", "text")
    val got = Text.boilerplateLines(docs, "id", "grp", "text", minDocs = 2)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got.values.forall(_ == (("", 1L))))
  }

  test("dedupParagraphs keeps exactly the FIRST occurrence corpus-wide " +
    "(min (id, pos)), removes within-doc repeats, exempts blank lines") {
    import spark.implicits._
    val docs = Seq(
      // doc 1 owns PROMO (pos 0) and its own text; repeats PROMO in-doc
      (1L, "PROMO!\nalpha\n\nPROMO!"),
      // doc 2's PROMO is a later copy (normalization folds the '!');
      // blank line survives even though doc 1 also has one
      (2L, "beta\n\npromo\ngamma"),
      // doc 3 repeats doc 2's own text
      (3L, "beta\ndelta")).toDF("id", "text")
    val got = Text.dedupParagraphs(docs, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (("PROMO!\nalpha\n", 1L)))     // in-doc repeat drops
    assert(got(2L) == (("beta\n\ngamma", 1L)))       // later cross-doc copy
    assert(got(3L) == (("delta", 1L)))               // doc 2 owns "beta"
    // layout-independence: a repartition must not change ownership
    val re = Text.dedupParagraphs(docs.repartition(7), "id", "text")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(re == got)
    // the non-integral-id (struct-min) fallback path agrees: string
    // ids "1".."3" order the same way as the longs here
    val sgot = Text.dedupParagraphs(
        docs.select(col("id").cast("string").as("id"), $"text"),
        "id", "text")
      .collect().map(r => (r.getString(0).toLong,
        (r.getString(1), r.getLong(2)))).toMap
    assert(sgot == got)
  }

  test("dedupParagraphs: a doc that is entirely later copies " +
    "reassembles to the empty string, not null") {
    import spark.implicits._
    val docs = Seq((1L, "SAME"), (2L, "SAME")).toDF("id", "text")
    val got = Text.dedupParagraphs(docs, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (("SAME", 0L)))
    assert(got(2L) == (("", 1L)))
  }

  test("ngramDiversity: exact type/token counts per slice, no Expand") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a b c a b c"),   // grams: abc bca cab abc -> 4 tot, 3 types
      (2L, "en", "a b c"),         // abc -> dup of type above
      (3L, "de", "x y"),           // too short: no grams
      (4L, "de", "x y z")          // xyz
    ).toDF("doc_id", "lang", "text")
    val got = Text.ngramDiversity(docs, "lang", col("text"), 3)
    val m = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("en") == ((5L, 3L)))
    assert(m("de") == ((1L, 1L)))
    // scale contract: the distinct count comes from the two-level
    // aggregation, not a countDistinct Expand over raw occurrences
    assert(!got.queryExecution.executedPlan.toString.contains("Expand"))
    assert(got.count() ==
      Text.ngramDiversity(docs.repartition(7), "lang", col("text"), 3)
        .count())
  }

  test("overlapMatrix: shared gram types per slice pair, a < b") {
    import spark.implicits._
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta"), // grams: abg, bgd
      (2L, "test", "alpha beta gamma"),        // abg  -> shared w/ train
      (3L, "test", "beta gamma delta"),        // bgd  -> shared w/ train
      (4L, "bench", "zeta eta theta"),         // disjoint
      (5L, "train", "alpha beta gamma")        // dup type, must not double
    ).toDF("doc_id", "split", "text")
    val got = Text.overlapMatrix(docs, "split", col("text"), 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // only the (test, train) pair overlaps: 2 shared TYPES, counted
    // once however many docs carry them; keys are sorted a < b
    assert(got == Map(("test", "train") -> 2L))
  }

  test("featureHash: bucket counts conserve the token mass, placement " +
      "is deterministic across layouts and stable for unseen tokens") {
    val docs = Seq((1L, "a b a c"), (2L, "b b"), (3L, "zzz-novel token"))
      .toDF("doc_id", "text")
      .withColumn("toks", Text.words(Text.normalize(col("text"))))
    def run(d: org.apache.spark.sql.DataFrame) =
      Text.featureHash(d, "doc_id", col("toks"), numBuckets = 8)
        .as[(Long, Seq[(Long, Long)], Long)].collect()
        .map(r => r._1 -> r).toMap
    val got = run(docs)
    // mass conservation: per-doc bucket counts sum to the token count
    assert(got(1L)._2.map(_._2).sum == 4L)
    assert(got(2L)._2.map(_._2).sum == 2L && got(2L)._3 == 1L)
    // the same token hashes identically wherever it appears: doc 2's
    // only bucket must be one of doc 1's ("b" appears in both)
    assert(got(1L)._2.map(_._1).contains(got(2L)._2.head._1))
    // buckets are sorted and within range
    got.values.foreach { r =>
      val bs = r._2.map(_._1)
      assert(bs == bs.sorted && bs.forall(b => b >= 0 && b < 8))
    }
    // a token never seen before still lands deterministically
    assert(run(docs.repartition(5)) == got)
  }

  test("blocklistHits / blocklistFilter: normalized word-boundary " +
      "matching, sorted distinct hits, filter is the exact complement") {
    val docs = Seq(
      (1L, "Clean prose about tables"),
      (2L, "BAD word here"),            // case-insensitive hit
      (3L, "bad bad BAD and worse"),    // repeated hits dedupe + sort
      (4L, "badge is not bad-ge"))      // substring must NOT match;
                                        // punctuation splits -> "bad" "ge"
    .toDF("doc_id", "text")
    val bl = Seq("bad", "worse")
    val hits = docs.select(col("doc_id"),
        Text.blocklistHits(col("text"), bl).as("h"))
      .as[(Long, Seq[String])].collect().toMap
    assert(hits(1L).isEmpty)
    assert(hits(2L) == Seq("bad"))
    assert(hits(3L) == Seq("bad", "worse"))
    assert(hits(4L) == Seq("bad")) // "badge" intact, "bad-ge" splits
    val kept = Text.blocklistFilter(docs, col("text"), bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("phraseBlocklistHits: multi-word boundary matching, raw " +
      "entries normalized, no substring false positives") {
    val docs = Seq(
      (1L, "run a big query today"),      // hit
      (2L, "big queryx is not a phrase"), // boundary: no hit
      (3L, "BIG, Query! punctuation"),    // normalization: hit
      (4L, "the biggest query around"),   // substring: no hit
      (5L, "slow scan and a big query"))  // two hits, sorted
    .toDF("doc_id", "text")
    val bl = Seq("Big Query!", "slow   scan") // raw entries normalize
    val hits = docs.select(col("doc_id"),
        Text.phraseBlocklistHits(col("text"), bl).as("h"))
      .as[(Long, Seq[String])].collect().toMap
    assert(hits(1L) == Seq("big query"))
    assert(hits(2L).isEmpty)
    assert(hits(3L) == Seq("big query"))
    assert(hits(4L).isEmpty)
    assert(hits(5L) == Seq("big query", "slow scan"))
    assert(Text.phraseBlocklistFilter(docs, col("text"), bl)
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
  }

  test("fixMojibake: repairs the double-decode set longest-first, " +
      "clean text is a fixed point, mojibakeChars counts recovery") {
    val rows = Seq(
      (1L, "cafÃ© crÃ¨me"),              // two 2-char repairs -> -2
      (2L, "â€œquotedâ€¦ naÃ¯veâ€™s"),   // 3-char + 2-char repairs
      (3L, "already clean — é ü “x”"),   // fixed point
      (4L, "Â« guillemets Â»"))
      .toDF("id", "t")
    val got = rows.select(col("id"),
        Text.fixMojibake(col("t")).as("f"),
        Text.mojibakeChars(col("t")).as("n"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("café crème", 2L)))
    assert(got(2L) == (("“quoted… naïve’s", 7L)))
    assert(got(3L) == (("already clean — é ü “x”", 0L)))
    assert(got(4L) == (("« guillemets »", 2L)))
    // idempotent: repairing repaired text changes nothing
    val twice = rows.select(
      Text.fixMojibake(Text.fixMojibake(col("t"))) ===
        Text.fixMojibake(col("t")))
    assert(twice.collect().forall(_.getBoolean(0)))
  }

  test("canonicalUrl: host case/www/default port/tracking params/" +
      "query order/trailing slash/fragment all collapse; malformed " +
      "input canonicalizes to null") {
    val rows = Seq(
      (1L, "HTTPS://WWW.Shop.COM:443/items//?utm_source=a&b=2&a=1#top"),
      (2L, "https://shop.com/items?a=1&b=2"), // already canonical twin
      (3L, "http://Host.org:80"),             // empty path -> "/"
      (4L, "http://host.org/?fbclid=xyz&ref=z"), // all params tracked
      (5L, "https://x.io:8443/p/"),           // NON-default port kept
      (6L, "ftp://Files.net:21/a"),           // unknown scheme: port kept
      (7L, "no scheme here"))
      .toDF("id", "u")
    val got = rows.select(col("id"), Text.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some("https://shop.com/items?a=1&b=2"))
    assert(got(1L) == got(2L), "the messy and clean twins must collide")
    assert(got(3L) == Some("http://host.org/"))
    assert(got(4L) == Some("http://host.org/"))
    assert(got(5L) == Some("https://x.io:8443/p"))
    assert(got(6L) == Some("ftp://files.net:21/a"))
    assert(got(7L).isEmpty, "malformed input must canonicalize to null")
  }

  test("gopherRules: each rule trips on its own hand-built violator " +
      "and the clean doc passes all") {
    val clean = ("the cat and dog that have fun with food " +
      "while words keep coming along nicely every day ") * 2 +
      "of course this be enough text to clear fifty words total " +
      "since the gate needs fifty real words here now done yes"
    val docs = Seq(
      (0L, clean),
      (1L, "too short to pass the word count rule with these words"),
      // 60 single-char words: mean word length 1 < 3
      (2L, Seq.fill(60)("a").mkString(" ")),
      // symbol rule: 50 words + 10 hashes -> ratio 10/60 > 0.1
      (3L, clean.split("\\s+").take(50).mkString(" ") +
        " # # # # # # # # # #"),
      // every line starts with a bullet
      (4L, Seq.fill(3)("- " + clean).mkString("\n")),
      // every line ends with an ellipsis
      (5L, Seq.fill(3)(clean + " ...").mkString("\n")),
      // numeric words: alpha fraction 0
      (6L, Seq.fill(60)("123").mkString(" ")),
      // only one distinct Gopher stop word ("the")
      (7L, ("the " * 30) + Seq.fill(30)("zzz").mkString(" ")))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id") +:
        Text.gopherRules(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    def ok(id: Long, field: String): Boolean =
      out(id).getAs[Boolean](field)
    assert(ok(0L, "gopher_keep"), s"clean doc must pass: ${out(0L)}")
    assert(!ok(1L, "word_count_ok") && !ok(1L, "gopher_keep"))
    assert(!ok(2L, "mean_word_len_ok"))
    assert(!ok(3L, "symbol_ratio_ok"))
    assert(!ok(4L, "bullet_ok") && ok(0L, "bullet_ok"))
    assert(!ok(5L, "ellipsis_ok") && ok(0L, "ellipsis_ok"))
    assert(!ok(6L, "alpha_ok"))
    assert(!ok(7L, "stopword_ok") && ok(0L, "stopword_ok"))
  }
}
