package graft

import org.apache.spark.sql.functions._

import graft.text.Robots
import graft.text.Robots.RobotsRule

/**
 * robots.txt (RFC 9309) parse / match / evaluate — unit edges for the
 * crawl-policy gate; the end-to-end verdicts are oracle-checked by the
 * w_robots query (closed-form answers per variant).
 */
class RobotsSpec extends SparkTestBase {

  // ---------- parser ----------

  test("parse: groups, comments, CRLF, case-insensitive fields") {
    val r = Robots.parse("h", "# top comment\r\n" +
      "USER-AGENT: BotA\r\nDisallow: /a # inline comment\r\n" +
      "allow: /a/ok\r\n\r\nUser-agent: *\r\nDisallow: /b\r\n")
    assert(r == Seq(
      RobotsRule("h", 1, "bota", "disallow", "/a", 2),
      RobotsRule("h", 1, "bota", "allow", "/a/ok", 5),
      RobotsRule("h", 2, "*", "disallow", "/b", 2)))
  }

  test("parse: consecutive user-agent lines share one group") {
    val r = Robots.parse("h",
      "User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert(r.map(x => (x.agent, x.group)).toSet == Set(("a", 1), ("b", 1)))
  }

  test("parse: rules before any group are ignored; empty disallow " +
    "emits no rule; sitemap is file-wide") {
    val r = Robots.parse("h",
      "Disallow: /orphan\nUser-agent: *\nDisallow:\n" +
        "Crawl-delay: 2\nSitemap: https://h/s.xml\n")
    assert(!r.exists(_.value == "/orphan"))
    assert(!r.exists(_.rtype == "disallow"))
    assert(r.contains(RobotsRule("h", 1, "*", "crawl-delay", "2", 0)))
    assert(r.contains(RobotsRule("h", 0, "*", "sitemap", "https://h/s.xml", 0)))
  }

  test("parse: a rule line after a non-rule line still binds its group; " +
    "a second user-agent AFTER rules starts a NEW group") {
    val r = Robots.parse("h",
      "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n")
    assert(r == Seq(
      RobotsRule("h", 1, "a", "disallow", "/x", 2),
      RobotsRule("h", 2, "b", "disallow", "/y", 2)))
  }

  // ---------- matcher (RFC 9309 §2.2.3) ----------

  test("match: literal prefix, '/' catch-all, full-path equality") {
    assert(Robots.matches("/priv", "/private/x"))
    assert(Robots.matches("/", "/anything"))
    assert(!Robots.matches("/a/b", "/a/c"))
    assert(Robots.matches("", "/x")) // empty pattern: universal prefix
  }

  test("match: '*' wildcards, including middle and multiple") {
    assert(Robots.matches("/*.pdf", "/docs/f.pdf"))
    assert(Robots.matches("/a*b*c", "/aXXbYYc-tail"))
    assert(!Robots.matches("/a*b*c", "/aXXcYYb"))
    assert(Robots.matches("/p*", "/p"))
  }

  test("match: '$' anchor hit and miss") {
    assert(Robots.matches("/*.pdf$", "/d/f.pdf"))
    assert(!Robots.matches("/*.pdf$", "/d/f.pdfx"))
    assert(Robots.matches("/a$", "/a"))
    assert(!Robots.matches("/a$", "/ab"))
    assert(Robots.matches("/a*$", "/ab")) // trailing * then anchor
    assert(!Robots.matches("$", "/x"))    // bare anchor = empty path only
  }

  test("match: anchored last literal may not overlap consumed prefix") {
    assert(Robots.matches("/a*a$", "/aa"))   // '*' matches zero chars
    assert(!Robots.matches("/ab*b$", "/ab")) // needs a second b
  }

  // ---------- evaluate (group selection + precedence) ----------

  private val rulesTxt = Seq(
    "h0" -> ("User-agent: bot\nDisallow: /private/\nAllow: /private/ok/\n" +
      "Crawl-delay: 3\n\nUser-agent: *\nDisallow: /\n"),
    "h1" -> "User-agent: *\nAllow: /ti/\nDisallow: /ti/\nDisallow: /t\n")

  private def verdicts(paths: Seq[(String, String)], agent: String) = {
    import spark.implicits._
    val rules = spark.createDataset(
      rulesTxt.flatMap { case (h, c) => Robots.parse(h, c) })
    val urls = paths.toDF("host", "pathq")
    Robots.evaluate(urls, rules, agent)
      .select("host", "pathq", "allowed", "rule", "crawl_delay")
      .collect().map(r => (r.getString(1), r.getBoolean(2),
        Option(r.getString(3)), Option(r.get(4)))).toSeq
  }

  test("evaluate: exact agent group shadows '*'; longest wins; " +
    "tie goes to allow; unknown host allowed") {
    val out = verdicts(Seq(
      ("h0", "/private/x"), ("h0", "/private/ok/x"), ("h0", "/pub"),
      ("h1", "/ti/z"), ("h1", "/tx"), ("nowhere", "/any")), "Bot")
    assert(out(0) == ("/private/x", false, Some("/private/"), Some(3.0)))
    assert(out(1) == ("/private/ok/x", true, Some("/private/ok/"), Some(3.0)))
    // '*' on h0 disallows / — but the exact group exists, so /pub passes
    assert(out(2) == ("/pub", true, None, Some(3.0)))
    assert(out(3) == ("/ti/z", true, Some("/ti/"), None)) // tie -> allow
    assert(out(4) == ("/tx", false, Some("/t"), None))
    assert(out(5) == ("/any", true, None, None))
  }

  test("evaluate: '*' group applies when no exact group matches") {
    val out = verdicts(Seq(("h0", "/pub")), "stranger")
    assert(out(0) == ("/pub", false, Some("/"), None))
  }
}
