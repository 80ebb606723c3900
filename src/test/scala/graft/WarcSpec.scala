package graft

import graft.data.Warc

/**
 * WARC ingest specs. Records are built by an independent test-side
 * writer and compressed with the JDK's REAL deflate (GZIPOutputStream,
 * dynamic Huffman — a different coding path than the query synthesis's
 * stored blocks), so the parse is pinned against genuine gzip output.
 * Edges: multi-member streams, revisit/request record types, LF-only
 * lines rejected, truncated members, bad Content-Length, trailing junk.
 */
class WarcSpec extends SparkTestBase {

  import spark.implicits._

  // Content-Length counts BYTES — always UTF-8 here (the container
  // JVM's default charset is US-ASCII, so a bare getBytes would
  // undercount multi-byte chars and misalign the record walk)
  private def bl(s: String): Int = s.getBytes("UTF-8").length

  private def rec(typ: String, uri: String, block: String): String = {
    val u = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    s"WARC/1.0\r\nWARC-Type: $typ\r\n$u" +
      s"Content-Length: ${bl(block)}\r\n\r\n$block\r\n\r\n"
  }

  private def http(status: String, ctype: String, body: String): String =
    s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${bl(body)}\r\n\r\n$body"

  private def gzip(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("plain shard: types, HTTP fields and body shas parse exactly") {
    val body = "hello <b>crawl</b> éé" // latin-1 range bytes
    val shard =
      rec("warcinfo", null, "software: test\r\n") +
      rec("response", "https://a.example/x",
        http("200 OK", "text/html; charset=utf-8", body)) +
      rec("request", "https://a.example/x",
        "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n") +
      rec("response", "https://a.example/y",
        http("301 Moved Permanently", "text/plain", ""))
    val got = Warc.parse(7L, shard.getBytes("UTF-8"))
    assert(got.map(_.warc_type) ==
      Seq("warcinfo", "response", "request", "response"))
    assert(got.forall(!_.compressed) && got.forall(_.shard_id == 7L))
    val r1 = got(1)
    assert(r1.http_status == 200 &&
      r1.content_type == "text/html; charset=utf-8")
    assert(r1.body_len == body.getBytes("UTF-8").length)
    assert(r1.body_sha256 == sha(body))
    // request records keep the raw block sha, no HTTP status
    assert(got(2).http_status == -1 && got(2).target_uri ==
      "https://a.example/x")
    // empty HTTP body: zero-length payload, real status
    assert(got(3).http_status == 301 && got(3).body_len == 0)
  }

  test("real-gzip multi-member shards inflate and parse identically") {
    val r0 = rec("warcinfo", null, "x: 1\r\n")
    val r1 = rec("response", "https://z.example/",
      http("404 Not Found", "text/plain", "nope " * 100))
    val plain = Warc.parse(1L, (r0 + r1).getBytes("UTF-8"))
    // one member per record (Common Crawl layout) AND one member for all
    val multi = Warc.parse(1L, gzip(r0) ++ gzip(r1))
    val single = Warc.parse(1L, gzip(r0 + r1))
    assert(plain.size == 2 && multi.size == 2 && single.size == 2)
    def strip(r: Warc.WarcRecord) = r.copy(compressed = false)
    assert(multi.map(strip) == plain && single.map(strip) == plain)
    assert(multi.forall(_.compressed))
  }

  test("malformed shards stop at the last well-formed record") {
    val good = rec("response", "https://g.example/",
      http("200 OK", "text/plain", "ok"))
    // truncated mid-body
    val t = (good + rec("response", "https://h.example/",
      http("200 OK", "text/plain", "lost"))).getBytes("UTF-8")
    assert(Warc.parse(1L, java.util.Arrays.copyOf(t, t.length - 10))
      .size == 1)
    // Content-Length overstating the payload
    val bad = good + "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort"
    assert(Warc.parse(1L, bad.getBytes("UTF-8")).size == 1)
    // junk between records
    val junk = good + "NOT-A-HEADER\r\n" + good
    assert(Warc.parse(1L, junk.getBytes("UTF-8")).size == 1)
    // truncated gzip member: everything already inflated still parses
    val gz = gzip(good)
    val cut = Warc.parse(1L, java.util.Arrays.copyOf(gz, gz.length - 4))
    assert(cut.size <= 1) // never throws
    assert(Warc.parse(1L, Array[Byte](1, 2, 3)) == Nil)
    assert(Warc.parse(1L, null) == Nil)
  }

  test("records() explodes shards distributively with no shuffle") {
    val shards = (0L until 8L).map { i =>
      (i, (rec("warcinfo", null, s"shard: $i\r\n") +
        rec("response", s"https://d.example/$i",
          http("200 OK", "text/plain", s"body-$i"))).getBytes("UTF-8"))
    }
    val ds = shards.toDS()
    val out = Warc.records(ds)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "shard explosion must not shuffle")
    val rows = out.collect()
    assert(rows.length == 16)
    assert(rows.count(_.warc_type == "response") == 8)
    assert(rows.filter(_.warc_type == "response")
      .forall(r => r.body_sha256 == sha(s"body-${r.shard_id}")))
  }
}
