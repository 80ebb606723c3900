package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML main-text extraction as ONE native expression over a string
 * column — the step between WARC response payloads ([[graft.data.Warc]])
 * and the text-quality pipeline ([[TextOps]]): a web-scale corpus is
 * .warc.gz shards of HTML, and training text is what's left after the
 * markup goes away. No DOM is built: a single forward walk tokenizes
 * tags/comments/entities and accumulates visible text, so cost is O(n)
 * bytes with O(block) memory — the per-row shape that survives a 100-TB
 * crawl (the expression fuses into whole-stage codegen beside the
 * quality gate that consumes it).
 *
 * Extraction model (documented, deterministic):
 *  - `<!-- .. -->` comments, `<!..>`/`<?..>` declarations are dropped;
 *    `<script>`/`<style>` drop their raw content up to the matching
 *    case-insensitive close tag (unterminated: to end of input).
 *  - `<` not followed by `[/!?]` or an ASCII letter is literal text
 *    (so `1 < 2` survives as text, like browsers parse it).
 *  - Attribute scans honor single/double quotes; `<a href=..>` values
 *    are collected in document order (raw, no resolution — see
 *    [[graft.functions.UrlOps]] for canonicalization).
 *  - Block-level tags (open OR close: p div h1-h6 li ul ol dl dt dd
 *    table thead tbody tr td th section article aside nav header footer
 *    blockquote pre figure figcaption form html head body title br hr)
 *    cut a block boundary; inline tags (a b i em strong span code ...)
 *    vanish. Each block's text is whitespace-collapsed (runs of
 *    `Character.isWhitespace` -> one space, trimmed); empty blocks are
 *    dropped; blocks join with `\n`.
 *  - Entities: the named set amp lt gt quot apos nbsp plus numeric
 *    `&#d+;` / `&#xh+;` (any code point, supplementary via surrogate
 *    pairs); anything else keeps the literal `&`. nbsp decodes to
 *    U+00A0, which is NOT collapse-whitespace (Java semantics).
 *  - The FIRST `<title>` element's collapsed text is the title field
 *    and never joins the body text.
 *  - `anchors(i)` is the collapsed visible text of the `<a>` that
 *    carried `links(i)` — the classic anchor-text relevance signal
 *    (w_anchors aggregates it per canonical target). Anchors cannot
 *    nest: a second `<a href>` before `</a>` finalizes the first.
 *
 * Reference anchor: pydantic's str validation treats wire text as an
 * untrusted string to normalize before checks (`_internal/_validators`);
 * here the normalization is the markup strip itself.
 */
object HtmlOps {

  val resultType: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = false),
    StructField("links", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("anchors", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_blocks", IntegerType, nullable = false)))

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "dl", "dt", "dd", "table", "thead", "tbody", "tr", "td", "th",
      "section", "article", "aside", "nav", "header", "footer",
      "blockquote", "pre", "figure", "figcaption", "form", "html", "head",
      "body", "title", "br", "hr").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean = Character.isWhitespace(c)

  /** Collapse whitespace runs to single spaces and trim. */
  private def collapse(s: java.lang.StringBuilder): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Decode the entity starting at `i` (which points at '&'); appends to
   * `sb` and returns the next index (i+1 with a literal '&' when the
   * bytes are not a recognized entity). */
  private def entity(h: String, i: Int, sb: java.lang.StringBuilder): Int = {
    val n = h.length
    var j = i + 1
    if (j < n && h.charAt(j) == '#') {
      j += 1
      var hexMode = false
      if (j < n && (h.charAt(j) == 'x' || h.charAt(j) == 'X')) {
        hexMode = true; j += 1
      }
      var cp = 0L
      val digits0 = j
      while (j < n && cp <= 0x10FFFF && {
        val c = h.charAt(j)
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (hexMode && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hexMode && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) { cp = cp * (if (hexMode) 16 else 10) + v; true }
        else false
      }) j += 1
      if (j > digits0 && j < n && h.charAt(j) == ';' && cp <= 0x10FFFF &&
        Character.isValidCodePoint(cp.toInt)) {
        sb.appendCodePoint(cp.toInt)
        return j + 1
      }
      sb.append('&'); return i + 1
    }
    // named entity: up to 8 letters then ';'
    var k = j
    while (k < n && k - j < 8 && Character.isLetter(h.charAt(k))) k += 1
    if (k < n && h.charAt(k) == ';') {
      h.substring(j, k) match {
        case "amp" => sb.append('&'); return k + 1
        case "lt" => sb.append('<'); return k + 1
        case "gt" => sb.append('>'); return k + 1
        case "quot" => sb.append('"'); return k + 1
        case "apos" => sb.append('\''); return k + 1
        case "nbsp" => sb.append(' '); return k + 1
        case _ =>
      }
    }
    sb.append('&')
    i + 1
  }

  private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Case-insensitive search for `</name` from `from`; returns the index
   * of '<' or -1. */
  private def findClose(h: String, from: Int, name: String): Int = {
    val n = h.length
    var i = from
    while (i + name.length + 2 <= n) {
      if (h.charAt(i) == '<' && h.charAt(i + 1) == '/') {
        var ok = true
        var k = 0
        while (ok && k < name.length) {
          if (lowerAscii(h.charAt(i + 2 + k)) != name.charAt(k)) ok = false
          k += 1
        }
        if (ok && i + 2 + name.length < n && {
          val after = h.charAt(i + 2 + name.length)
          after == '>' || after == '/' || isWs(after)
        }) return i
      }
      i += 1
    }
    -1
  }

  final class Extracted(val title: String, val text: String,
      val links: Array[String], val anchors: Array[String],
      val nBlocks: Int)

  /** The single-pass walk (see object doc). Total, never throws. */
  def extract(html: String): Extracted = {
    val n = html.length
    val cur = new java.lang.StringBuilder(64)
    val blocks = new scala.collection.mutable.ArrayBuffer[String](8)
    val links = new scala.collection.mutable.ArrayBuffer[String](4)
    // anchors(i) = collapsed visible text of the <a> that carried
    // links(i); `<a href>` without a matching `</a>` (or interrupted
    // by the next `<a href>` — HTML anchors cannot nest) finalizes
    // with whatever text accumulated, keeping the arrays aligned.
    val anchors = new scala.collection.mutable.ArrayBuffer[String](4)
    val anc = new java.lang.StringBuilder(32)
    var ancActive = false
    def finishAnchor(): Unit = if (ancActive) {
      anchors += collapse(anc); anc.setLength(0); ancActive = false
    }
    var title: String = null
    var inTitle = false
    var titleDone = false

    def flush(): Unit = {
      val s = collapse(cur)
      cur.setLength(0)
      if (s.nonEmpty) {
        if (inTitle) { if (title == null) title = s }
        else blocks += s
      }
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 3 < n && html.charAt(i + 1) == '!' &&
          html.charAt(i + 2) == '-' && html.charAt(i + 3) == '-') {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n && (Character.isLetter(html.charAt(i + 1)) ||
          (html.charAt(i + 1) == '/' && i + 2 < n &&
            Character.isLetter(html.charAt(i + 2))))) {
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val name = new java.lang.StringBuilder(8)
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) {
            name.append(lowerAscii(html.charAt(j))); j += 1
          }
          val tag = name.toString
          // attribute scan to '>' honoring quotes; collect href on <a>
          var href: String = null
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (!closing && tag == "a" && href == null && ch == '=') {
              // check the key just before '=' is href (ci, trimmed)
              var ks = j - 1
              while (ks >= i && isWs(html.charAt(ks))) ks -= 1
              if (ks >= i + 4 &&
                lowerAscii(html.charAt(ks - 3)) == 'h' &&
                lowerAscii(html.charAt(ks - 2)) == 'r' &&
                lowerAscii(html.charAt(ks - 1)) == 'e' &&
                lowerAscii(html.charAt(ks)) == 'f' &&
                (ks - 4 < i || isWs(html.charAt(ks - 4)))) {
                var vs = j + 1
                while (vs < n && isWs(html.charAt(vs))) vs += 1
                if (vs < n && (html.charAt(vs) == '"' || html.charAt(vs) == '\'')) {
                  val q = html.charAt(vs)
                  val ve = html.indexOf(q, vs + 1)
                  if (ve > 0) href = html.substring(vs + 1, ve)
                } else {
                  var ve = vs
                  while (ve < n && !isWs(html.charAt(ve)) &&
                    html.charAt(ve) != '>') ve += 1
                  if (ve > vs) href = html.substring(vs, ve)
                }
              }
            }
            j += 1
          }
          i = if (j < n) j + 1 else n
          if (tag == "a") {
            if (closing) finishAnchor()
            else if (href != null) {
              finishAnchor() // implicit close: anchors cannot nest
              links += href
              ancActive = true
            }
          } else if (href != null) links += href
          if (!closing && (tag == "script" || tag == "style")) {
            val e = findClose(html, i, tag)
            if (e < 0) i = n
            else {
              val g = html.indexOf('>', e)
              i = if (g < 0) n else g + 1
            }
          } else if (tag == "title") {
            // always a block boundary; only the FIRST title captures
            flush()
            if (!closing && !titleDone) inTitle = true
            else if (closing && inTitle) { inTitle = false; titleDone = true }
          } else if (BlockTags.contains(tag)) {
            flush()
            // a block boundary inside an open anchor separates words
            if (ancActive) anc.append(' ')
          }
          // inline tags: no boundary
        } else {
          cur.append('<'); i += 1 // literal '<' (e.g. "1 < 2")
          if (ancActive) anc.append('<')
        }
      } else if (c == '&') {
        val p = cur.length
        i = entity(html, i, cur)
        if (ancActive) anc.append(cur, p, cur.length)
      } else {
        cur.append(c); i += 1
        if (ancActive) anc.append(c)
      }
    }
    // unterminated title never flushes into body text
    if (!inTitle) flush()
    finishAnchor() // unterminated <a> keeps the arrays aligned
    new Extracted(title,
      blocks.mkString("\n"), links.toArray, anchors.toArray, blocks.length)
  }

  /** eval/codegen funnel (cf. [[graft.functions.BytesDecode]]). */
  def extractRow(s: UTF8String): InternalRow = {
    val e = extract(s.toString)
    new GenericInternalRow(Array[Any](
      if (e.title == null) null else UTF8String.fromString(e.title),
      UTF8String.fromString(e.text),
      new GenericArrayData(e.links.map(UTF8String.fromString(_))),
      new GenericArrayData(e.anchors.map(UTF8String.fromString(_))),
      e.nBlocks))
  }

  def htmlExtractCol(c: Column): Column =
    ColumnShim.column(HtmlExtract(ColumnShim.expression(c)))
}

/** `html_extract(str)` -> struct<title, text, links, n_blocks>
 * (see [[HtmlOps]]). */
case class HtmlExtract(child: Expression) extends UnaryExpression {
  override def prettyName: String = "html_extract"
  override def dataType: DataType = HtmlOps.resultType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    HtmlOps.extractRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.text.HtmlOps.extractRow($s);")

  override protected def withNewChildInternal(c: Expression): HtmlExtract =
    copy(child = c)
}
