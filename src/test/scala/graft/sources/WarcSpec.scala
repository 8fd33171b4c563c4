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
}
