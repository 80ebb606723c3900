package graft

import org.apache.spark.sql.functions._

import graft.text.WebClean

/**
 * WebClean pipeline specs — the WARC -> HTML -> dedup chain on a
 * handcrafted corpus, independent of the w_pipeline synthesis: shards
 * built by the test-side writer (real JDK gzip for odd shards), with
 * known URL-spelling collisions, an envelope-reject pair, a gate
 * casualty, and a cross-shard content duplicate. Also pins the chain's
 * SCALE SHAPE: exactly two exchanges (URL dedup, content dedup) — the
 * parse, envelope filter, canonicalization and markup strip must all
 * run map-side.
 */
class WebCleanSpec extends SparkTestBase {

  import spark.implicits._

  private def bl(s: String): Int = s.getBytes("UTF-8").length

  private def rec(typ: String, uri: String, block: String): String = {
    val u = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    s"WARC/1.0\r\nWARC-Type: $typ\r\n$u" +
      s"Content-Length: ${bl(block)}\r\n\r\n$block\r\n\r\n"
  }

  private def page(uri: String, html: String): String =
    rec("response", uri,
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html")

  private def gzip(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("url spellings collapse, envelope/gate/content drops, 2 exchanges") {
    val article = "<html><head><title>T</title></head><body>" +
      "<p>seven whole tokens of real article text</p></body></html>"
    val legal = "<html><body><p>the same legal boilerplate on every " +
      "site</p></body></html>"
    // shard 0: the article at the plain spelling + a 404 + its legal copy
    val s0 = page("http://a.org/art", article) +
      rec("response", "http://a.org/gone",
        "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
          "<p>gone page with many tokens here</p>") +
      page("http://a.org/legal", legal)
    // shard 1 (gzip members): SAME article at two messy spellings of the
    // same canonical URL + a text/plain 200 + a too-short page
    val s1recs = Seq(
      page("HTTP://A.ORG:80/art#frag", article),
      page("http://a.org/x/../art", article),
      rec("response", "http://b.org/robots",
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
          "plain text with plenty of tokens to pass any gate"),
      page("http://b.org/spam", "<html><body><p>buy</p></body></html>"))
    // shard 2: legal boilerplate again at another URL (content dup)
    val s2 = page("http://b.org/legal", legal)
    val shards = spark.createDataset(spark.sparkContext.parallelize(Seq(
      (0L, s0.getBytes("UTF-8")),
      (1L, s1recs.map(gzip).reduce(_ ++ _)),
      (2L, s2.getBytes("UTF-8"))), 2))

    val out = WebClean.run(shards, minTokens = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 2,
      s"expected exactly 2 exchanges (URL dedup, content dedup):\n$plan")

    val rows = out.collect().map(r => (r.getAs[String]("url"),
      r.getAs[Long]("shard_id"), r.getAs[String]("title"),
      r.getAs[Int]("n_tokens"), r.getAs[String]("text_sha256"))).sortBy(_._1)
    // survivors: the article once (earliest crawl = shard 0, despite two
    // more spellings in shard 1) and ONE legal copy (shard 0 beats 2)
    assert(rows.length == 2)
    val Array(art, leg) = rows.sortBy(_._1)
    assert(art._1 == "http://a.org/art" && art._2 == 0L && art._3 == "T")
    assert(art._4 == 7 &&
      art._5 == sha("seven whole tokens of real article text"))
    assert(leg._1 == "http://a.org/legal" && leg._2 == 0L &&
      leg._3 == null &&
      leg._5 == sha("the same legal boilerplate on every site"))
  }

  test("earliest-crawl tie-break is (shard, rec) within one shard too") {
    // one shard carrying the same canonical URL twice: rec 0 wins
    val s = page("http://c.org/p", "<html><p>first crawl of this page " +
      "body</p></html>") +
      page("http://c.org/p#sec", "<html><p>second crawl of this page " +
        "body</p></html>")
    val out = WebClean.run(Seq((9L, s.getBytes("UTF-8"))).toDS(), 3)
      .collect()
    assert(out.length == 1 && out(0).getAs[Int]("rec_idx") == 0)
    assert(out(0).getAs[String]("text_sha256") ==
      sha("first crawl of this page body"))
  }
}
