package graft.web

/**
 * Sitemap XML ingest (sitemaps.org protocol 0.9) — the discovery-side
 * companion of [[graft.text.Robots]]: robots.txt names the sitemap
 * files (`Sitemap:` lines, which `Robots.parse` already surfaces), the
 * sitemap files name the URLs, and the frontier ([[Frontier]]) turns
 * the union into a fetch schedule. A crawl-scale ingest parses millions
 * of these files; each is small (protocol cap: 50k URLs / 50 MB), so
 * the Spark shape is host-dimension flatMap — map-only, no shuffle,
 * exactly the `Robots.parse` precedent.
 *
 * Grammar subset (the published protocol, not general XML):
 *  - `<urlset>` roots yield kind=`url` entries from `<url>` elements:
 *    `<loc>` (required — entries without one are skipped), `<lastmod>`
 *    (W3C datetime, kept verbatim + a parsed `lastmod_day` when a
 *    `YYYY-MM-DD` prefix is present), `<changefreq>`, `<priority>`
 *    (decimal 0.0–1.0, held EXACTLY as integer milli-units — 0.5 →
 *    500 — so downstream weighting never touches a float).
 *  - `<sitemapindex>` roots yield kind=`sitemap` entries from
 *    `<sitemap>` elements (loc + lastmod; the recursive fetch is the
 *    caller's loop).
 *  - Namespace prefixes (`<sm:url>`), attributes on any tag, XML
 *    comments, and CDATA sections in text content are all tolerated;
 *    the five XML entities plus `&#NN;`/`&#xHH;` decode (supplementary
 *    code points included).
 *  - TOTAL parse: malformed input yields the entries whose elements
 *    are well-formed and skips the rest — a broken host file never
 *    kills the crawl (the `Robots.parse` / WARC-tail discipline; the
 *    pydantic analogue is parse-or-violation, never throw —
 *    `networks.py` Url parsing on untrusted wire bytes).
 *
 * Out of protocol scope, documented: gzip transport (sitemap.xml.gz
 * arrives via the WARC/HTTP layer which already inflates members —
 * `graft.data.Warc`), RSS/Atom feeds-as-sitemaps, and the image/video
 * extension namespaces.
 */
object Sitemap {

  /** One sitemap entry. `kind` = `url` (urlset member) | `sitemap`
   * (sitemapindex member). `priorityMilli` is the exact decimal in
   * 1/1000 units (None when absent or out of 0.0–1.0); `lastmodDay`
   * is the `YYYY-MM-DD` prefix when present and calendar-valid. */
  final case class SitemapEntry(
      host: String, kind: String, loc: String,
      lastmod: Option[String], lastmodDay: Option[String],
      changefreq: Option[String], priorityMilli: Option[Int])

  private val ValidFreqs = Set(
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** Parse one host's sitemap file (urlset or sitemapindex). Total —
   * malformed elements are skipped, never thrown on. */
  def parse(host: String, content: String): Seq[SitemapEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SitemapEntry]
    if (content == null) return out.toSeq
    val isIndex = findOpen(content, "sitemapindex", 0) >= 0
    val isSet = findOpen(content, "urlset", 0) >= 0
    if (!isIndex && !isSet) return out.toSeq
    val (itemTag, kind) =
      if (isIndex) ("sitemap", "sitemap") else ("url", "url")
    var pos = 0
    var guard = 0
    while (pos < content.length && guard < 1000000) {
      guard += 1
      val item = element(content, itemTag, pos)
      if (item == null) pos = content.length
      else {
        val (body, next) = item
        childText(body, "loc").filter(_.nonEmpty)
          .foreach { loc =>
            val lastmod = childText(body, "lastmod").filter(_.nonEmpty)
            val freq =
              if (isIndex) None
              else childText(body, "changefreq")
                .map(_.toLowerCase(java.util.Locale.ROOT))
                .filter(ValidFreqs.contains)
            val prio = if (isIndex) None
              else childText(body, "priority").flatMap(parsePriority)
            out += SitemapEntry(host, kind, loc, lastmod,
              lastmod.flatMap(dayPrefix), freq, prio)
          }
        pos = next
      }
    }
    out.toSeq
  }

  /** `0.5` → `Some(500)`; exact decimal arithmetic, range-checked. */
  private[graft] def parsePriority(s: String): Option[Int] =
    try {
      val d = new java.math.BigDecimal(s.trim)
      val milli = d.movePointRight(3)
      if (milli.scale > 0 && milli.stripTrailingZeros.scale > 0) None
      else {
        val v = milli.intValueExact()
        if (v < 0 || v > 1000) None else Some(v)
      }
    } catch { case _: ArithmeticException | _: NumberFormatException => None }

  /** `YYYY-MM-DD` prefix of a W3C datetime, calendar-validated. */
  private[graft] def dayPrefix(s: String): Option[String] = {
    if (s.length < 10) return None
    val day = s.substring(0, 10)
    if (s.length > 10 && s.charAt(10) != 'T') return None
    try {
      java.time.LocalDate.parse(day)
      Some(day)
    } catch { case _: java.time.format.DateTimeParseException => None }
  }

  // ------------------------------------------------------------ scanner

  /** Index just past `<tag...>` for the next open tag named `tag`
   * (namespace prefix tolerated), or -1. Case-insensitive. */
  private def findOpen(s: String, tag: String, from: Int): Int = {
    var i = from
    while (i >= 0 && i < s.length) {
      i = s.indexOf('<', i)
      if (i < 0) return -1
      if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i); if (e < 0) return -1 else i = e + 3
      } else if (s.startsWith("<![CDATA[", i)) {
        val e = s.indexOf("]]>", i); if (e < 0) return -1 else i = e + 3
      } else {
        val close = s.indexOf('>', i)
        if (close < 0) return -1
        var nameStart = i + 1
        if (nameStart < s.length &&
            (s.charAt(nameStart) == '/' || s.charAt(nameStart) == '!' ||
             s.charAt(nameStart) == '?')) { i = close + 1 }
        else {
          var nameEnd = nameStart
          while (nameEnd < close && !isNameEnd(s.charAt(nameEnd))) nameEnd += 1
          val colon = s.lastIndexOf(':', nameEnd - 1)
          val local = if (colon >= nameStart) s.substring(colon + 1, nameEnd)
                      else s.substring(nameStart, nameEnd)
          if (local.equalsIgnoreCase(tag) &&
              (nameEnd >= close || s.charAt(close - 1) != '/'))
            return close + 1
          i = close + 1
        }
      }
    }
    -1
  }

  private def isNameEnd(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '>' || c == '/'

  /** Matching `</tag>` (any-case, prefix-tolerant) at or after `from`,
   * returning the index of its `<`, or -1. Nested same-name elements do
   * not occur in the protocol; the first close wins. */
  private def findClose(s: String, tag: String, from: Int): Int = {
    var i = from
    while (i >= 0 && i < s.length) {
      i = s.indexOf("</", i)
      if (i < 0) return -1
      var nameStart = i + 2
      val close = s.indexOf('>', nameStart)
      if (close < 0) return -1
      var nameEnd = nameStart
      while (nameEnd < close && !isNameEnd(s.charAt(nameEnd))) nameEnd += 1
      val colon = s.lastIndexOf(':', nameEnd - 1)
      val local = if (colon >= nameStart) s.substring(colon + 1, nameEnd)
                  else s.substring(nameStart, nameEnd)
      if (local.equalsIgnoreCase(tag)) return i
      i = close + 1
    }
    -1
  }

  /** Next `tag` element at/after `from`: (inner body, index past the
   * close tag), or null when none remains well-formed. */
  private def element(s: String, tag: String, from: Int)
      : (String, Int) = {
    val bodyStart = findOpen(s, tag, from)
    if (bodyStart < 0) return null
    val bodyEnd = findClose(s, tag, bodyStart)
    if (bodyEnd < 0) return null
    val closeGt = s.indexOf('>', bodyEnd)
    (s.substring(bodyStart, bodyEnd), if (closeGt < 0) s.length else closeGt + 1)
  }

  /** Trimmed, entity-decoded text content of the first child `tag`
   * inside `body`. CDATA sections unwrap WITHOUT entity decoding
   * (their bytes are literal by definition). */
  private def childText(body: String, tag: String): Option[String] = {
    val start = findOpen(body, tag, 0)
    if (start < 0) return None
    val end = findClose(body, tag, start)
    if (end < 0) return None
    val t = body.substring(start, end).trim
    if (t.startsWith("<![CDATA[")) {
      val e = t.indexOf("]]>")
      Some((if (e >= 0) t.substring(9, e) else t.substring(9)).trim)
    } else Some(decodeEntities(t).trim)
  }

  /** XML entity decode: the five named entities plus decimal/hex
   * character references (supplementary planes included). Unknown
   * entities pass through literally (total parse). */
  private[graft] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { b.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { b.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if name.length > 1 && name.charAt(0) == '#' =>
              try {
                val cp = if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                  Integer.parseInt(name.substring(2), 16)
                else Integer.parseInt(name.substring(1))
                if (Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (rep == null) { b.append(c); i += 1 }
          else { b.append(rep); i = semi + 1 }
        }
      }
    }
    b.toString
  }
}
