package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * robots.txt (RFC 9309) crawl-policy evaluation — the governance gate a
 * web-scale ingest runs BEFORE fetching or keeping a page: for each URL,
 * which rule of the host's robots.txt applies to this crawler, and is
 * the URL allowed. A 100-TB crawl holds billions of URLs against a few
 * million robots files, so the shape is: parse the (small) per-host
 * policy dimension once, pick the crawler's user-agent group per host,
 * broadcast the effective rule arrays, and evaluate every URL map-only
 * with higher-order array functions — ZERO added shuffles on the URL
 * side.
 *
 * Semantics implemented (RFC 9309 §2):
 *  - groups: one or more consecutive `User-agent:` lines own the
 *    `Allow:` / `Disallow:` / `Crawl-delay:` lines that follow (§2.2.1);
 *    rules before any group header are ignored; `Sitemap:` is file-wide;
 *  - group selection: the group(s) whose agent token equals the
 *    crawler's product token case-insensitively; only when none exist
 *    does the `*` group apply (§2.2.1) — an exact group SHADOWS `*`;
 *  - matching: a rule matches when its pattern matches a prefix of the
 *    URL's path-plus-query; `*` matches any char sequence, a trailing
 *    `$` anchors the match to the full string end (§2.2.3);
 *  - precedence: the MOST SPECIFIC match wins — longest pattern in
 *    octets; on a tie allow beats disallow (§2.2.2); no matching rule
 *    (or no applicable group, or no robots.txt at all) means allowed;
 *  - an empty `Disallow:` value emits no rule (= allow everything);
 *    `#` starts a comment; field names are case-insensitive.
 *
 * Reference anchor: pydantic validates URL/host wire forms
 * (`networks.py` Url types); this module is the companion policy check
 * the same untrusted wire data is subjected to — parse-or-ignore on the
 * policy file (a malformed line never kills the crawl), verdict rows in
 * the same loc/rule/value shape as the violation sink.
 */
object Robots {

  /** One parsed robots.txt line in rule position. `rtype`:
   * `allow` / `disallow` (value = path pattern, spec = octet length),
   * `crawl-delay` (value = seconds literal), `sitemap` (file-wide,
   * agent = "*"). `group` numbers the user-agent group within the host's
   * file so delay attribution survives multi-group files. */
  final case class RobotsRule(
      host: String, group: Int, agent: String,
      rtype: String, value: String, spec: Int)

  /** Parse one host's robots.txt. Total: malformed lines are skipped,
   * never thrown on. */
  def parse(host: String, content: String): Seq[RobotsRule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotsRule]
    if (content == null) return out.toSeq
    var group = -1            // -1 = no group open; rules land nowhere
    var agents: List[String] = Nil
    var prevWasAgent = false
    var groupCount = 0
    content.split("\n", -1).foreach { raw0 =>
      val raw = if (raw0.endsWith("\r")) raw0.dropRight(1) else raw0
      val hash = raw.indexOf('#')
      val line = (if (hash < 0) raw else raw.substring(0, hash)).trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!prevWasAgent) { // a NEW group starts
              groupCount += 1; group = groupCount; agents = Nil
            }
            agents = value.toLowerCase(java.util.Locale.ROOT) :: agents
            prevWasAgent = true
          case "allow" | "disallow" =>
            prevWasAgent = false
            if (group > 0 && value.nonEmpty)
              agents.foreach(a =>
                out += RobotsRule(host, group, a, field, value, value.length))
          case "crawl-delay" =>
            prevWasAgent = false
            if (group > 0 && value.nonEmpty)
              agents.foreach(a =>
                out += RobotsRule(host, group, a, "crawl-delay", value, 0))
          case "sitemap" =>
            prevWasAgent = false
            if (value.nonEmpty)
              out += RobotsRule(host, 0, "*", "sitemap", value, 0)
          case _ => prevWasAgent = false
        }
      } else if (line.nonEmpty) prevWasAgent = false
    }
    out.toSeq
  }

  /** RFC 9309 §2.2.3 pattern match against path-plus-query: literal
   * prefix with `*` wildcards; trailing `$` anchors to the string end.
   * Iterative greedy scan — no regex, no allocation beyond split. */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern == null || path == null) return false
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    // first literal must sit at position 0
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    if (parts.length == 1) return !anchored || pos == path.length
    // middle literals: greedy — first occurrence at/after pos
    var i = 1
    while (i < parts.length - 1) {
      val part = parts(i)
      if (part.nonEmpty) {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    val last = parts(parts.length - 1)
    if (anchored) path.length - last.length >= pos && path.endsWith(last)
    else last.isEmpty || path.indexOf(last, pos) >= 0
  }

  def matchesUtf8(p: UTF8String, s: UTF8String): Boolean =
    matches(p.toString, s.toString)

  def robotsMatchCol(pattern: Column, path: Column): Column =
    ColumnShim.column(RobotsMatch(
      ColumnShim.expression(pattern), ColumnShim.expression(path)))

  /**
   * The crawler's effective policy per host: RFC group selection for
   * `agent` collapsed into ONE broadcastable row per host —
   * `(host, rules: array<struct<rtype,pattern,spec>>, crawl_delay)`.
   * The exact-agent tier shadows `*` per §2.2.1. Runs entirely on the
   * (small) policy dimension: one groupBy over rule rows.
   */
  def effectivePolicy(rules: Dataset[RobotsRule], agent: String): DataFrame = {
    val ua = agent.toLowerCase(java.util.Locale.ROOT)
    val grouped = rules.toDF()
      .filter(col("rtype").isin("allow", "disallow", "crawl-delay"))
      .withColumn("exact", (col("agent") === lit(ua)).cast("int"))
    // does an exact group exist on this host?
    val tier = grouped.groupBy("host")
      .agg(max(col("exact")).as("has_exact"))
    grouped.join(tier, "host")
      .filter((col("has_exact") === 1 && col("exact") === 1) ||
        (col("has_exact") === 0 && col("agent") === "*"))
      .groupBy("host")
      .agg(
        sort_array(collect_list(when(
          col("rtype").isin("allow", "disallow"),
          struct(col("spec"), col("rtype"), col("value").as("pattern")))))
          .as("rules"),
        max(when(col("rtype") === "crawl-delay",
          col("value").cast("double"))).as("crawl_delay"))
  }

  /**
   * Verdict per URL row. `pages` must carry `host` and `pathq`
   * (path-plus-query) columns; everything else passes through. The
   * policy side is broadcast (robots files are a bounded dimension even
   * at crawl scale — shard by host if it ever isn't), the match + the
   * most-specific-wins fold run as higher-order array expressions inside
   * the URL scan's own projection: the URL table is never shuffled.
   * Output adds: `allowed`, `rule` (winning pattern or null), `rtype`,
   * `spec`, `crawl_delay`.
   */
  def evaluate(pages: DataFrame, rules: Dataset[RobotsRule],
      agent: String): DataFrame = {
    val policy = effectivePolicy(rules, agent)
    val matched = filter(col("rules"),
      r => robotsMatchCol(r.getField("pattern"), col("pathq")))
    // most-specific-wins fold: longer pattern beats shorter; on equal
    // length allow beats disallow (struct compare on (spec, rtype) works
    // because "disallow" > "allow" lexically — invert via the rtype flag)
    val winner = aggregate(matched,
      lit(null).cast("struct<spec:int,rtype:string,pattern:string>"),
      (acc, r) => when(acc.isNull, r)
        .when(r.getField("spec") > acc.getField("spec"), r)
        .when(r.getField("spec") === acc.getField("spec") &&
          r.getField("rtype") === "allow" &&
          acc.getField("rtype") === "disallow", r)
        .otherwise(acc))
    pages
      .join(broadcast(policy), Seq("host"), "left")
      .withColumn("w", winner)
      .withColumn("allowed",
        col("w").isNull || col("w.rtype") === "allow")
      .withColumn("rule", col("w.pattern"))
      .withColumn("rtype", col("w.rtype"))
      .withColumn("spec", col("w.spec"))
      .drop("rules", "w")
  }
}

/** `robots_match(pattern, pathq)` — RFC 9309 §2.2.3 rule match (see
 * [[Robots.matches]]): `*` wildcard, trailing `$` anchor, prefix
 * semantics otherwise. Null input -> null (standard null-safe binary). */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "robots_match"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(p: Any, s: Any): Any =
    Robots.matchesUtf8(p.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, s) =>
      s"${ev.value} = graft.text.Robots.matchesUtf8($p, $s);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RobotsMatch = copy(left = l, right = r)
}
