package graft

import org.apache.spark.sql.functions._

import graft.web.{Frontier, Sitemap}
import graft.web.Sitemap.SitemapEntry

/**
 * Sitemap XML parse + crawl-frontier scheduling — unit edges; the
 * end-to-end rows are oracle-checked by w_sitemap / w_frontier.
 */
class SitemapFrontierSpec extends SparkTestBase {

  // ---------- sitemap parser ----------

  test("urlset: full entry, entity decode, priority milli-units") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url>
        |  <loc>https://h.example/a?x=1&amp;y=2</loc>
        |  <lastmod>2024-01-15T08:00:00+02:00</lastmod>
        |  <changefreq>Daily</changefreq>
        |  <priority>0.8</priority>
        | </url>
        | <url><loc>https://h.example/b</loc></url>
        |</urlset>""".stripMargin
    val r = Sitemap.parse("h.example", xml)
    assert(r == Seq(
      SitemapEntry("h.example", "url", "https://h.example/a?x=1&y=2",
        Some("2024-01-15T08:00:00+02:00"), Some("2024-01-15"),
        Some("daily"), Some(800)),
      SitemapEntry("h.example", "url", "https://h.example/b",
        None, None, None, None)))
  }

  test("sitemapindex: kind=sitemap, comments skipped, no freq/prio") {
    val xml = "<sitemapindex><!-- c --><sitemap>" +
      "<loc>https://h/s1.xml</loc><lastmod>2024-06-30</lastmod>" +
      "</sitemap><sitemap><loc>https://h/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    val r = Sitemap.parse("h", xml)
    assert(r.map(_.kind).distinct == Seq("sitemap"))
    assert(r.map(_.loc) == Seq("https://h/s1.xml", "https://h/s2.xml"))
    assert(r.head.lastmodDay.contains("2024-06-30"))
  }

  test("namespace prefixes, CDATA loc kept raw, attributes tolerated") {
    val xml = """<sm:urlset xmlns:sm="x"><sm:url data-k="v">""" +
      "<sm:loc><![CDATA[https://h/c?a=1&b=2&amp;literal]]></sm:loc>" +
      "</sm:url></sm:urlset>"
    val r = Sitemap.parse("h", xml)
    // CDATA bytes are literal: &amp; must NOT decode inside
    assert(r.map(_.loc) == Seq("https://h/c?a=1&b=2&amp;literal"))
  }

  test("invalid priority / changefreq / calendar day degrade to None") {
    val xml = "<urlset><url><loc>https://h/x</loc>" +
      "<lastmod>2024-02-30T01:02:03Z</lastmod>" + // Feb 30 is no day
      "<changefreq>sometimes</changefreq>" +
      "<priority>1.5</priority></url>" +
      "<url><loc>https://h/y</loc><priority>0.1234</priority>" +
      "<lastmod>yesterday</lastmod></url></urlset>"
    val r = Sitemap.parse("h", xml)
    assert(r.size == 2)
    assert(r(0).lastmod.contains("2024-02-30T01:02:03Z"))
    assert(r(0).lastmodDay.isEmpty) // raw kept, parsed day rejected
    assert(r(0).changefreq.isEmpty && r(0).priorityMilli.isEmpty)
    assert(r(1).priorityMilli.isEmpty) // fractional milli
    assert(r(1).lastmod.contains("yesterday") && r(1).lastmodDay.isEmpty)
  }

  test("total parse: malformed roots/elements yield what is well-formed") {
    assert(Sitemap.parse("h", null).isEmpty)
    assert(Sitemap.parse("h", "").isEmpty)
    assert(Sitemap.parse("h", "<html><body>nope</body></html>").isEmpty)
    // second url never closes: first survives, no throw
    val r = Sitemap.parse("h", "<urlset><url><loc>https://h/ok</loc>" +
      "</url><url><loc>https://h/broken")
    assert(r.map(_.loc) == Seq("https://h/ok"))
    // entry without loc is skipped
    assert(Sitemap.parse("h",
      "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>").isEmpty)
  }

  test("numeric character references decode incl. supplementary") {
    val xml = "<urlset><url><loc>https://h/&#47;p&#x2F;&#128169;</loc>" +
      "</url></urlset>"
    val r = Sitemap.parse("h", xml)
    assert(r.map(_.loc) == Seq("https://h//p/💩"))
  }

  // ---------- priority exactness ----------

  test("parsePriority: exact decimal, range-checked, no float round") {
    assert(Sitemap.parsePriority("0.5").contains(500))
    assert(Sitemap.parsePriority("1").contains(1000))
    assert(Sitemap.parsePriority("1.0").contains(1000))
    assert(Sitemap.parsePriority("0").contains(0))
    assert(Sitemap.parsePriority("0.125").contains(125))
    assert(Sitemap.parsePriority("0.1234").isEmpty) // sub-milli
    assert(Sitemap.parsePriority("1.001").isEmpty)  // > 1.0
    assert(Sitemap.parsePriority("-0.1").isEmpty)
    assert(Sitemap.parsePriority("abc").isEmpty)
  }

  // ---------- frontier ----------

  test("delayMs: exact DECIMAL seconds to integer ms") {
    val df = spark.range(1).select(
      Frontier.delayMs(lit("1.5")).as("a"),
      Frontier.delayMs(lit("0.1")).as("b"),
      Frontier.delayMs(lit("10")).as("c"),
      Frontier.delayMs(lit("-1")).as("d"),
      Frontier.delayMs(lit("x")).as("e"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 1500L && r.getLong(1) == 100L &&
      r.getLong(2) == 10000L && r.isNullAt(3) && r.isNullAt(4))
  }

  test("schedule: budget cap, queue order, politeness offsets, shard") {
    import spark.implicits._
    // host A: 4 pages, weights 10,30,30,20 -> order by (w DESC, id ASC)
    // host B: 1 page, no declared delay -> default
    val cands = Seq(
      ("A", 1L, 10L), ("A", 2L, 30L), ("A", 3L, 30L), ("A", 4L, 20L),
      ("B", 9L, 5L)).toDF("host", "page_id", "weight")
    val delays = Seq(("A", 2000L)).toDF("host", "delay_ms")
    val out = Frontier.schedule(cands, delays,
        maxPerHost = 3, nShards = 4, defaultDelayMs = 700L)
      .orderBy("host", "slot").collect()
    assert(out.length == 4) // A capped at 3, B has 1
    val a = out.filter(_.getString(0) == "A")
    assert(a.map(r => (r.getInt(2), r.getLong(3), r.getLong(6))).toSeq ==
      Seq((0, 2L, 0L), (1, 3L, 2000L), (2, 4L, 4000L)))
    val b = out.filter(_.getString(0) == "B")(0)
    assert(b.getLong(5) == 700L && b.getLong(6) == 0L)
    // shard is the md5-60-bit placement, stable and in range
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    assert(a.map(_.getLong(1)).distinct.length == 1) // one shard per host
  }

  test("schedule: the capped groupBy is the only exchange") {
    import spark.implicits._
    val cands = Seq(("A", 1L, 1L)).toDF("host", "page_id", "weight")
    val delays = Seq(("A", 100L)).toDF("host", "delay_ms")
    val plan = Frontier.schedule(cands, delays, 5, 8)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 exchange, plan:\n$plan")
  }
}
