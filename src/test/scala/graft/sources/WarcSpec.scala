package graft.sources

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def rec(tpe: String, uri: String, payload: String,
      extraHeader: String = ""): Array[Byte] = {
    val p = payload.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: $tpe\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      extraHeader +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes("UTF-8") ++
      p ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit = {
    new java.io.File(dir).mkdirs()
    val out = new java.io.FileOutputStream(s"$dir/$name")
    try out.write(bytes) finally out.close()
  }

  test("records: Content-Length split — a payload CONTAINING the " +
      "'WARC/1.0' magic does not tear the record") {
    val dir = graft.core.Scratch.dir("warc_magic")
    val evil = "quoting the spec: WARC/1.0\r\nWARC-Type: fake\r\n\r\nboom"
    write(dir, "a.warc",
      rec("conversion", "http://x/1", evil) ++
        rec("conversion", "http://x/2", "plain second record"))
    val got = Warc.records(spark, dir)
      .select(col("record_idx"), col("target_uri"),
        col("payload").cast("string"))
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(got.length == 2, s"magic bytes in a payload tore the split")
    assert(got(0) == ((0, "http://x/1", evil)))
    assert(got(1) == ((1, "http://x/2", "plain second record")))
  }

  test("records: header names are case-insensitive, warcinfo and " +
      "conversion records coexist, record_idx preserves file order") {
    val dir = graft.core.Scratch.dir("warc_headers")
    val weird = ("WARC/1.0\r\nwarc-type: conversion\r\n" +
      "WARC-TARGET-URI: http://x/w\r\ncontent-length: 2\r\n\r\nhi" +
      "\r\n\r\n").getBytes("UTF-8")
    write(dir, "a.warc", rec("warcinfo", null, "software: test") ++ weird)
    val got = Warc.records(spark, dir)
      .select("record_idx", "warc_type", "target_uri", "content_length")
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, "warcinfo", null, 14L),
      (1, "conversion", "http://x/w", 2L)))
  }

  test("records: multi-member .gz container (one gzip member per " +
      "record, the Common-Crawl layout) decodes as one stream") {
    val dir = graft.core.Scratch.dir("warc_gz")
    def member(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    write(dir, "a.warc.gz",
      member(rec("conversion", "http://x/1", "first")) ++
        member(rec("conversion", "http://x/2", "second")))
    val got = Warc.records(spark, dir)
      .select(col("record_idx"), col("payload").cast("string"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, "first"), (1, "second")))
  }

  test("records: malformation is LOUD — truncated payload and missing " +
      "Content-Length fail the read instead of dropping records") {
    val dir1 = graft.core.Scratch.dir("warc_trunc")
    write(dir1, "a.warc",
      rec("conversion", "http://x/1", "full").dropRight(10))
    val e1 = intercept[Exception] {
      Warc.records(spark, dir1).count()
    }
    assert(e1.getMessage != null)
    val dir2 = graft.core.Scratch.dir("warc_nolen")
    write(dir2, "a.warc",
      "WARC/1.0\r\nWARC-Type: conversion\r\n\r\npayload\r\n\r\n"
        .getBytes("UTF-8"))
    intercept[Exception] { Warc.records(spark, dir2).count() }
  }

  test("responseHtml: response records yield their HTML body with the " +
      "HTTP headers stripped — a CRLF CRLF inside the body does not " +
      "truncate it, and non-response records are excluded") {
    val dir = graft.core.Scratch.dir("warc_response")
    val html = "<p>hello</p>\r\n\r\n<p>second block</p>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${html.getBytes("UTF-8").length}\r\n\r\n" + html
    write(dir, "a.warc",
      rec("warcinfo", null, "x") ++
        rec("response", "http://x/r", http) ++
        rec("conversion", "http://x/c", "plain text"))
    val got = Warc.responseHtml(spark, dir)
      .select("target_uri", "html").as[(String, String)].collect()
    assert(got.toSeq == Seq(("http://x/r", html)),
      s"expected the exact HTML body, got $got")
  }

  test("a non-WARC container fails at the header-line cap instead of " +
      "buffering the whole stream (the per-task memory bound holds " +
      "for garbage matched by the glob)") {
    val dir = graft.core.Scratch.dir("warc_junk")
    // 256 KiB with no newline: an uncapped readLine would accumulate
    // it all; the cap must fire at 64 KiB with a diagnosable message
    write(dir, "junk.warc", Array.fill[Byte](256 * 1024)('A'))
    val e = intercept[Exception] { Warc.records(spark, dir).count() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("header line exceeds")),
      s"expected the header-line cap to fire, got: ${msgs(e)}")
  }

  test("wetText: conversion-only view with UTF-8 decoded text " +
      "(multibyte payload lengths are byte counts, not char counts)") {
    val dir = graft.core.Scratch.dir("warc_wet")
    val uni = "café 中文 😀"
    write(dir, "a.wet",
      rec("warcinfo", null, "x") ++ rec("conversion", "http://x/u", uni))
    val got = Warc.wetText(spark, dir, pathGlob = "*.wet")
      .select("text", "content_length").as[(String, Long)].collect()
    assert(got.toSeq == Seq((uni, uni.getBytes("UTF-8").length.toLong)))
  }

  // ===== HTTP payload decoding (round 17) =====

  private def recB(uri: String, payload: Array[Byte]): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")

  private def http(headers: String, body: Array[Byte]): Array[Byte] =
    s"HTTP/1.1 200 OK\r\n$headers\r\n".getBytes("ISO-8859-1") ++ body

  test("transferDecode: chunked bodies reassemble exactly; chunk-size " +
      "lines and extensions never leak; bad framing is loud") {
    val body = ("x" * 400).getBytes("UTF-8")
    val chunked =
      (s"${0x9d.toHexString};ext=1\r\n".getBytes("ISO-8859-1") ++
        body.take(157) ++ "\r\n".getBytes ++
        "9D\r\n".getBytes ++ body.slice(157, 314) ++ "\r\n".getBytes ++
        "56\r\n".getBytes ++ body.drop(314) ++ "\r\n".getBytes ++
        "0\r\n\r\n".getBytes)
    assert(Warc.transferDecode(chunked, "chunked", "t").toSeq ==
      body.toSeq)
    // identity passes through untouched
    assert(Warc.transferDecode(body, "", "t") eq body)
    // truncated chunk → loud
    val torn = chunked.take(100)
    val e = intercept[Exception] {
      Warc.transferDecode(torn, "chunked", "t")
    }
    assert(e.getMessage.contains("truncated") ||
      e.getMessage.contains("unterminated"))
    // an encoding this engine can't undo → loud, named
    val e2 = intercept[Exception] {
      Warc.transferDecode(body, "br", "t")
    }
    assert(e2.getMessage.contains("unsupported Transfer-Encoding"))
    // a LIST with a coding we'd silently skip → loud too ("gzip,
    // chunked" is legal HTTP; ignoring the gzip hop would hand binary
    // to the charset decoder)
    val e3 = intercept[Exception] {
      Warc.transferDecode(body, "gzip, chunked", "t")
    }
    assert(e3.getMessage.contains("unsupported Transfer-Encoding"))
    // identity members are harmless and accepted
    val chunked1 = ("3\r\nabc\r\n0\r\n\r\n").getBytes("ISO-8859-1")
    assert(new String(Warc.transferDecode(chunked1,
      "identity, chunked", "t"), "UTF-8") == "abc")
  }

  test("contentDecode: gzip and deflate inflate; the bomb guard " +
      "fires before buffering past the cap; corrupt members are loud") {
    val body = ("payload " * 100).getBytes("UTF-8")
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    assert(Warc.contentDecode(gz(body), "gzip", 1 << 20, "t").toSeq ==
      body.toSeq)
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(body); d.close()
    assert(Warc.contentDecode(bos.toByteArray, "deflate", 1 << 20,
      "t").toSeq == body.toSeq)
    // bomb guard: 10 MiB of zeros gzips tiny but must not inflate
    // past a 1 MiB cap
    val bomb = gz(new Array[Byte](10 << 20))
    val e = intercept[Exception] {
      Warc.contentDecode(bomb, "gzip", 1 << 20, "t")
    }
    assert(e.getMessage.contains("bomb guard"))
    val e2 = intercept[Exception] {
      Warc.contentDecode(body, "gzip", 1 << 20, "t")
    }
    assert(e2.getMessage.contains("corrupt gzip"))
  }

  test("charsetOf: header param beats meta tag beats UTF-8 default; " +
      "garbage labels fall back instead of failing") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val meta = "<html><head><meta charset='iso-8859-1'></head>"
      .getBytes("ISO-8859-1")
    assert(Warc.charsetOf("text/html; charset=ISO-8859-1",
      Array.emptyByteArray) == ISO_8859_1)
    assert(Warc.charsetOf("text/html", meta) == ISO_8859_1)
    // header wins over a conflicting meta
    assert(Warc.charsetOf("text/html; charset=utf-8", meta) == UTF_8)
    assert(Warc.charsetOf("text/html", "<p>x</p>".getBytes) == UTF_8)
    assert(Warc.charsetOf("text/html; charset=x-not-a-charset",
      "<p>x</p>".getBytes) == UTF_8)
  }

  test("responseDecoded end to end: chunked+gzip+latin-1 records all " +
      "recover the original text; a latin-1 é through the identity " +
      "path would be U+FFFD (proving the decode actually ran)") {
    val dir = graft.core.Scratch.dir("warc_decode_unit")
    val page = "<p>résumé наб 中</p>"
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val utf = page.getBytes("UTF-8")
    val chunkedBody =
      s"${utf.length.toHexString}\r\n".getBytes("ISO-8859-1") ++ utf ++
        "\r\n0\r\n\r\n".getBytes
    val latin = "<p>café</p>".getBytes("ISO-8859-1")
    write(dir, "d.warc",
      recB("http://x/1", http("Content-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\n", chunkedBody)) ++
      recB("http://x/2", http("Content-Type: text/html\r\n" +
        "Content-Encoding: gzip\r\n", gz(utf))) ++
      recB("http://x/3", http(
        "Content-Type: text/html; charset=iso-8859-1\r\n", latin)))
    val got = Warc.responseDecoded(spark, dir)
      .select("target_uri", "charset", "text")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("http://x/1", "UTF-8", page),
      ("http://x/2", "UTF-8", page),
      ("http://x/3", "ISO-8859-1", "<p>café</p>")), got.mkString("; "))
    // control: the same latin-1 bytes decoded as UTF-8 mangle the é
    assert(Warc.decodeLenient(latin,
      java.nio.charset.StandardCharsets.UTF_8).contains('�'))
  }
}
