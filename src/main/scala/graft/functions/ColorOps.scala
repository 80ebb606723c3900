package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The pydantic `Color` type as pure Column expressions.
 *
 * Reference: `pydantic/color.py` — `parse_str` (:281-339, format dispatch),
 * regexes (:52-66), `parse_color_value`/`parse_float_alpha` (:355-410),
 * `parse_hsl` (:413-441, colorsys `hls_to_rgb`), `as_hex` (:139-155,
 * short-form when every byte repeats its nibble), `as_rgb` (:157-164),
 * `COLORS_BY_NAME` (:455-603 — the standard CSS3 extended color table).
 *
 * Internal representation: `struct<r,g,b,alpha double>` with channels in
 * [0,1] (exactly pydantic's RGBA), `alpha` null when absent (pydantic
 * collapses alpha==1 to None); the WHOLE struct is null when the string
 * is not a valid color (`color_error`). All float arithmetic replays
 * pydantic's operation order so golden fixtures match bit-for-bit;
 * byte rounding uses bround (round-half-even, = Python round()).
 *
 * Everything is codegen'd: regex gates (rlike/regexp_extract), a literal
 * CSS name map (try_element_at), CaseWhen chains for the HSL branches.
 */
object ColorOps {

  /** CSS3 extended named colors (public standard table). */
  val ColorsByName: Map[String, (Int, Int, Int)] = Map(
    "aliceblue"->(240,248,255), "antiquewhite"->(250,235,215), "aqua"->(0,255,255), "aquamarine"->(127,255,212),
    "azure"->(240,255,255), "beige"->(245,245,220), "bisque"->(255,228,196), "black"->(0,0,0),
    "blanchedalmond"->(255,235,205), "blue"->(0,0,255), "blueviolet"->(138,43,226), "brown"->(165,42,42),
    "burlywood"->(222,184,135), "cadetblue"->(95,158,160), "chartreuse"->(127,255,0), "chocolate"->(210,105,30),
    "coral"->(255,127,80), "cornflowerblue"->(100,149,237), "cornsilk"->(255,248,220), "crimson"->(220,20,60),
    "cyan"->(0,255,255), "darkblue"->(0,0,139), "darkcyan"->(0,139,139), "darkgoldenrod"->(184,134,11),
    "darkgray"->(169,169,169), "darkgreen"->(0,100,0), "darkgrey"->(169,169,169), "darkkhaki"->(189,183,107),
    "darkmagenta"->(139,0,139), "darkolivegreen"->(85,107,47), "darkorange"->(255,140,0), "darkorchid"->(153,50,204),
    "darkred"->(139,0,0), "darksalmon"->(233,150,122), "darkseagreen"->(143,188,143), "darkslateblue"->(72,61,139),
    "darkslategray"->(47,79,79), "darkslategrey"->(47,79,79), "darkturquoise"->(0,206,209), "darkviolet"->(148,0,211),
    "deeppink"->(255,20,147), "deepskyblue"->(0,191,255), "dimgray"->(105,105,105), "dimgrey"->(105,105,105),
    "dodgerblue"->(30,144,255), "firebrick"->(178,34,34), "floralwhite"->(255,250,240), "forestgreen"->(34,139,34),
    "fuchsia"->(255,0,255), "gainsboro"->(220,220,220), "ghostwhite"->(248,248,255), "gold"->(255,215,0),
    "goldenrod"->(218,165,32), "gray"->(128,128,128), "green"->(0,128,0), "greenyellow"->(173,255,47),
    "grey"->(128,128,128), "honeydew"->(240,255,240), "hotpink"->(255,105,180), "indianred"->(205,92,92),
    "indigo"->(75,0,130), "ivory"->(255,255,240), "khaki"->(240,230,140), "lavender"->(230,230,250),
    "lavenderblush"->(255,240,245), "lawngreen"->(124,252,0), "lemonchiffon"->(255,250,205), "lightblue"->(173,216,230),
    "lightcoral"->(240,128,128), "lightcyan"->(224,255,255), "lightgoldenrodyellow"->(250,250,210), "lightgray"->(211,211,211),
    "lightgreen"->(144,238,144), "lightgrey"->(211,211,211), "lightpink"->(255,182,193), "lightsalmon"->(255,160,122),
    "lightseagreen"->(32,178,170), "lightskyblue"->(135,206,250), "lightslategray"->(119,136,153), "lightslategrey"->(119,136,153),
    "lightsteelblue"->(176,196,222), "lightyellow"->(255,255,224), "lime"->(0,255,0), "limegreen"->(50,205,50),
    "linen"->(250,240,230), "magenta"->(255,0,255), "maroon"->(128,0,0), "mediumaquamarine"->(102,205,170),
    "mediumblue"->(0,0,205), "mediumorchid"->(186,85,211), "mediumpurple"->(147,112,219), "mediumseagreen"->(60,179,113),
    "mediumslateblue"->(123,104,238), "mediumspringgreen"->(0,250,154), "mediumturquoise"->(72,209,204), "mediumvioletred"->(199,21,133),
    "midnightblue"->(25,25,112), "mintcream"->(245,255,250), "mistyrose"->(255,228,225), "moccasin"->(255,228,181),
    "navajowhite"->(255,222,173), "navy"->(0,0,128), "oldlace"->(253,245,230), "olive"->(128,128,0),
    "olivedrab"->(107,142,35), "orange"->(255,165,0), "orangered"->(255,69,0), "orchid"->(218,112,214),
    "palegoldenrod"->(238,232,170), "palegreen"->(152,251,152), "paleturquoise"->(175,238,238), "palevioletred"->(219,112,147),
    "papayawhip"->(255,239,213), "peachpuff"->(255,218,185), "peru"->(205,133,63), "pink"->(255,192,203),
    "plum"->(221,160,221), "powderblue"->(176,224,230), "purple"->(128,0,128), "red"->(255,0,0),
    "rosybrown"->(188,143,143), "royalblue"->(65,105,225), "saddlebrown"->(139,69,19), "salmon"->(250,128,114),
    "sandybrown"->(244,164,96), "seagreen"->(46,139,87), "seashell"->(255,245,238), "sienna"->(160,82,45),
    "silver"->(192,192,192), "skyblue"->(135,206,235), "slateblue"->(106,90,205), "slategray"->(112,128,144),
    "slategrey"->(112,128,144), "snow"->(255,250,250), "springgreen"->(0,255,127), "steelblue"->(70,130,180),
    "tan"->(210,180,140), "teal"->(0,128,128), "thistle"->(216,191,216), "tomato"->(255,99,71),
    "turquoise"->(64,224,208), "violet"->(238,130,238), "wheat"->(245,222,179), "white"->(255,255,255),
    "whitesmoke"->(245,245,245), "yellow"->(255,255,0), "yellowgreen"->(154,205,50)
  )

  // regexes transcribed from pydantic/color.py:52-66 (fullmatch => ^...$)
  private val R255 = "(\\d{1,3}(?:\\.\\d+)?)"
  private val Comma = "\\s*,\\s*"
  private val AlphaRe = "(\\d(?:\\.\\d+)?|\\.\\d+|\\d{1,2}%)"
  private val Rh = "(-?\\d+(?:\\.\\d+)?|-?\\.\\d+)(deg|rad|turn)?"
  private val Rsl = "(\\d{1,3}(?:\\.\\d+)?)%"
  val HexShortRe = "^\\s*(?:#|0x)?([0-9a-f])([0-9a-f])([0-9a-f])([0-9a-f])?\\s*$"
  val HexLongRe =
    "^\\s*(?:#|0x)?([0-9a-f]{2})([0-9a-f]{2})([0-9a-f]{2})([0-9a-f]{2})?\\s*$"
  val RgbRe = s"^\\s*rgba?\\(\\s*$R255$Comma$R255$Comma$R255(?:$Comma$AlphaRe)?\\s*\\)\\s*$$"
  val RgbV4Re = s"^\\s*rgba?\\(\\s*$R255\\s+$R255\\s+$R255(?:\\s*/\\s*$AlphaRe)?\\s*\\)\\s*$$"
  val HslRe = s"^\\s*hsla?\\(\\s*$Rh$Comma$Rsl$Comma$Rsl(?:$Comma$AlphaRe)?\\s*\\)\\s*$$"
  val HslV4Re = s"^\\s*hsla?\\(\\s*$Rh\\s+$Rsl\\s+$Rsl(?:\\s*/\\s*$AlphaRe)?\\s*\\)\\s*$$"

  private val nameMap = typedLit(ColorsByName.map { case (k, (r, g, b)) =>
    k -> Seq(r, g, b)
  })

  private def dnull = lit(null).cast(DoubleType)

  /** ANSI-safe numeric cast of a regexp_extract group: '' (no match /
   * absent group) becomes null instead of a CAST_INVALID_INPUT throw —
   * mandatory because whole-stage codegen's subexpression elimination may
   * hoist a shared cast ABOVE its CaseWhen guard. */
  private def num(s: Column): Column =
    nullif(s, lit("")).cast(DoubleType)

  private def rgba(r: Column, g: Column, b: Column, a: Column): Column =
    struct(r.as("r"), g.as("g"), b.as("b"), a.as("alpha"))

  private val nullRgba = lit(null).cast(
    "struct<r:double,g:double,b:double,alpha:double>")

  /** parse_float_alpha (color.py:383-410): "" => null (absent), '%' =>
   * /100, alpha==1 => null; out of [0,1] is a struct-level error (the
   * caller checks [[alphaBad]] first). */
  private def alphaRaw(s: Column): Column =
    when(s.endsWith("%"),
      s.substr(lit(1), length(s) - 1).cast(DoubleType) / 100.0)
      .otherwise(num(s))

  private def alphaOf(s: Column): Column = {
    // parse_float_alpha drops alpha via math.isclose(alpha, 1) — default
    // rel_tol 1e-9, abs_tol 0 (color.py:383-410) — not exact equality:
    // 0.9999999999 must collapse to null exactly like pydantic
    val a = alphaRaw(s)
    val close1 = abs(a - 1.0) <= lit(1e-9) * greatest(abs(a), lit(1.0))
    when(s === "" || s.isNull, dnull)
      .otherwise(when(close1, dnull).otherwise(a))
  }

  private def alphaBad(s: Column): Column =
    s =!= "" && s.isNotNull && (alphaRaw(s) < 0.0 || alphaRaw(s) > 1.0)

  private def hex2(d: Column): Column =
    conv(d, 16, 10).cast(DoubleType) / 255.0

  /** colorsys.hls_to_rgb's `_v` (the reference delegates to colorsys). */
  private def hlsV(m1: Column, m2: Column, hue0: Column): Column = {
    val hue = pmod(hue0, lit(1.0))
    when(hue < 1.0 / 6.0, m1 + (m2 - m1) * hue * 6.0)
      .when(hue < 0.5, m2)
      .when(hue < 2.0 / 3.0, m1 + (m2 - m1) * (lit(2.0 / 3.0) - hue) * 6.0)
      .otherwise(m1)
  }

  // ----- shared per-format struct builders (single definition for BOTH
  // parseColor's CaseWhen dispatch and withParsedColor's split columns —
  // a fix to one dispatch path cannot drift from the other)

  private def g(v: Column, re: String, i: Int) = regexp_extract(v, re, i)

  private def namedOf(v: Column): Column = {
    // no trim: parse_str looks up value_lower verbatim ('  black ' fails)
    val named = try_element_at(nameMap, v)
    when(named.isNotNull, rgba(
      element_at(named, 1).cast(DoubleType) / 255.0,
      element_at(named, 2).cast(DoubleType) / 255.0,
      element_at(named, 3).cast(DoubleType) / 255.0, dnull))
      .otherwise(nullRgba)
  }

  /** hex short: int(d*2, 16) / 255; alpha nibble likewise. */
  private def hexShortOf(v: Column): Column = {
    val a = g(v, HexShortRe, 4)
    rgba(
      hex2(concat(g(v, HexShortRe, 1), g(v, HexShortRe, 1))),
      hex2(concat(g(v, HexShortRe, 2), g(v, HexShortRe, 2))),
      hex2(concat(g(v, HexShortRe, 3), g(v, HexShortRe, 3))),
      when(a === "", dnull).otherwise {
        val av = hex2(concat(a, a))
        when(av === 1.0, dnull).otherwise(av)
      })
  }

  private def hexLongOf(v: Column): Column = {
    val a = g(v, HexLongRe, 4)
    rgba(hex2(g(v, HexLongRe, 1)), hex2(g(v, HexLongRe, 2)),
      hex2(g(v, HexLongRe, 3)),
      when(a === "", dnull).otherwise {
        val av = hex2(a)
        when(av === 1.0, dnull).otherwise(av)
      })
  }

  private def rgbOf(v: Column, re: String): Column = {
    val (r, gg, b, a) = (g(v, re, 1), g(v, re, 2), g(v, re, 3), g(v, re, 4))
    val bad = num(r) > 255.0 || num(gg) > 255.0 ||
      num(b) > 255.0 || alphaBad(a)
    when(bad, nullRgba).otherwise(rgba(
      num(r) / 255.0, num(gg) / 255.0,
      num(b) / 255.0, alphaOf(a)))
  }

  private def hslOf(v: Column, re: String): Column = {
    val (h, unit, s, l, a) =
      (g(v, re, 1), g(v, re, 2), g(v, re, 3), g(v, re, 4), g(v, re, 5))
    val sBad = num(s) > 100.0 || num(l) > 100.0 || alphaBad(a)
    val hv = {
      val hd = num(h)
      when(unit === "rad", pmod(hd, lit(2 * math.Pi)) / (2 * math.Pi))
        .when(unit === "turn", pmod(hd, lit(1.0)))
        .otherwise(pmod(hd, lit(360.0)) / 360.0) // None | deg
    }
    val sv = num(s) / 100.0
    val lv = num(l) / 100.0
    // colorsys.hls_to_rgb(h, l, s)
    val m2 = when(lv <= 0.5, lv * (lit(1.0) + sv)).otherwise(lv + sv - lv * sv)
    val m1 = lv * 2.0 - m2
    val out = when(sv === 0.0, rgba(lv, lv, lv, alphaOf(a))).otherwise(
      rgba(hlsV(m1, m2, hv + 1.0 / 3.0), hlsV(m1, m2, hv),
        hlsV(m1, m2, hv - 1.0 / 3.0), alphaOf(a)))
    when(sBad, nullRgba).otherwise(out)
  }

  /**
   * parse_str (color.py:281-339): named -> hex short -> hex long -> rgb
   * (css3 + v4) -> hsl (css3 + v4); anything else (or out-of-range
   * channel/alpha) is NULL = `color_error`. Returns
   * `struct<r,g,b,alpha:double>` in [0,1].
   */
  def parseColor(c: Column): Column = {
    val v = lower(c)
    val named = namedOf(v)
    when(named.isNotNull, named)
      .when(v.rlike(HexShortRe), hexShortOf(v))
      .when(v.rlike(HexLongRe), hexLongOf(v))
      .when(v.rlike(RgbRe), rgbOf(v, RgbRe))
      .when(v.rlike(RgbV4Re), rgbOf(v, RgbV4Re))
      .when(v.rlike(HslRe), hslOf(v, HslRe))
      .when(v.rlike(HslV4Re), hslOf(v, HslV4Re))
      .otherwise(nullRgba)
  }

  /** float_to_255 (color.py:444-452): Python round() is half-even =
   * Spark bround. */
  private def b255(c: Column): Column = bround(c * 255.0).cast(IntegerType)

  private def pair(b: Column): Column = lpad(lower(hex(b)), 2, "0")

  /** as_hex (color.py:139-155): '#rrggbb[aa]', shortened to '#rgb[a]'
   * when every byte repeats its nibble (byte % 17 == 0). Null-safe. */
  def colorAsHex(parsed: Column): Column = {
    val r = b255(parsed.getField("r"))
    val g = b255(parsed.getField("g"))
    val b = b255(parsed.getField("b"))
    val aN = parsed.getField("alpha")
    val a = b255(aN)
    val shortRgb = r % 17 === 0 && g % 17 === 0 && b % 17 === 0
    def nib(x: Column) = substring(pair(x), 1, 1)
    val full = when(aN.isNull,
      when(shortRgb, concat(lit("#"), nib(r), nib(g), nib(b)))
        .otherwise(concat(lit("#"), pair(r), pair(g), pair(b))))
      .otherwise(
        when(shortRgb && a % 17 === 0,
          concat(lit("#"), nib(r), nib(g), nib(b), nib(a)))
          .otherwise(concat(lit("#"), pair(r), pair(g), pair(b), pair(a))))
    when(parsed.isNull, lit(null).cast(StringType)).otherwise(full)
  }

  /** as_rgb (color.py:157-164): 'rgb(r, g, b)' / 'rgba(r, g, b, a)' with
   * alpha rounded to 2 places (Python round = half-even = bround). */
  def colorAsRgb(parsed: Column): Column = {
    val r = b255(parsed.getField("r"))
    val g = b255(parsed.getField("g"))
    val b = b255(parsed.getField("b"))
    val aN = parsed.getField("alpha")
    val s = when(aN.isNull,
      concat(lit("rgb("), r.cast(StringType), lit(", "), g.cast(StringType),
        lit(", "), b.cast(StringType), lit(")")))
      .otherwise(
        concat(lit("rgba("), r.cast(StringType), lit(", "),
          g.cast(StringType), lit(", "), b.cast(StringType), lit(", "),
          bround(aN, 2).cast(StringType), lit(")")))
    when(parsed.isNull, lit(null).cast(StringType)).otherwise(s)
  }

  /** Validity gate (color_error when false and input non-null). */
  def isColor(c: Column): Column = parseColor(c).isNotNull

  /**
   * DataFrame-level parse that keeps WHOLE-STAGE CODEGEN alive: the
   * single-Column [[parseColor]] is one CaseWhen over six format parsers,
   * and Janino refuses to compile the resulting >64KB method (Spark falls
   * back to per-expression codegen — correct but slower). Here each
   * format parses in its own projection column (independently codegen'd,
   * each well under the method limit) and a final cheap `coalesce` picks
   * the first match — the formats' regexes are mutually exclusive, and
   * named-before-hex ordering preserves parse_str's dispatch (color.py:
   * 281-339; 'tan' is a CSS name before it is 3 hex digits).
   */
  def withParsedColor(df: org.apache.spark.sql.DataFrame, inCol: String,
                      outCol: String): org.apache.spark.sql.DataFrame = {
    val v = lower(col(inCol))
    // per-format structs via the SHARED builders (same expression trees as
    // parseColor's dispatch), each gated by its own rlike
    val namedStruct = namedOf(v)
    val hexShort = when(v.rlike(HexShortRe), hexShortOf(v)).otherwise(nullRgba)
    val hexLong = when(v.rlike(HexLongRe), hexLongOf(v)).otherwise(nullRgba)
    def rgbCol(re: String) =
      when(v.rlike(re), rgbOf(v, re)).otherwise(nullRgba)
    // HSL in two steps: the hlsV branches reference m1/m2 three times each,
    // so inlining them would exponentiate the tree (the original >64KB
    // method). Materializing (hv, sv, lv, m1, m2, alpha, bad) per variant
    // as their own columns — each referenced 2+ times downstream — keeps
    // CollapseProject from inlining and every generated method small.
    // (This two-step shape is intentionally NOT shared with [[hslOf]].)
    def hslMid(re: String, sfx: String)(d0: org.apache.spark.sql.DataFrame) = {
      val (h, unit, s, l, a) =
        (g(v, re, 1), g(v, re, 2), g(v, re, 3), g(v, re, 4), g(v, re, 5))
      val hd = num(h)
      val hv = when(unit === "rad", pmod(hd, lit(2 * math.Pi)) / (2 * math.Pi))
        .when(unit === "turn", pmod(hd, lit(1.0)))
        .otherwise(pmod(hd, lit(360.0)) / 360.0)
      val sv = num(s) / 100.0
      val lv = num(l) / 100.0
      val m2 = when(lv <= 0.5, lv * (lit(1.0) + sv)).otherwise(lv + sv - lv * sv)
      d0.withColumn(s"__hv$sfx", when(v.rlike(re), hv).otherwise(dnull))
        .withColumn(s"__sv$sfx", when(v.rlike(re), sv).otherwise(dnull))
        .withColumn(s"__lv$sfx", when(v.rlike(re), lv).otherwise(dnull))
        .withColumn(s"__m2$sfx", when(v.rlike(re), m2).otherwise(dnull))
        .withColumn(s"__aa$sfx", when(v.rlike(re), alphaOf(a)).otherwise(dnull))
        .withColumn(s"__bd$sfx", v.rlike(re) &&
          (num(s) > 100.0 || num(l) > 100.0 || alphaBad(a)))
    }
    def hslCol(sfx: String) = {
      val (hv, sv, lv, m2, aa, bd) = (col(s"__hv$sfx"), col(s"__sv$sfx"),
        col(s"__lv$sfx"), col(s"__m2$sfx"), col(s"__aa$sfx"), col(s"__bd$sfx"))
      val m1 = lv * 2.0 - m2
      val out = when(sv === 0.0, rgba(lv, lv, lv, aa)).otherwise(
        rgba(hlsV(m1, m2, hv + 1.0 / 3.0), hlsV(m1, m2, hv),
          hlsV(m1, m2, hv - 1.0 / 3.0), aa))
      when(hv.isNull || bd, nullRgba).otherwise(out)
    }
    val withMid = hslMid(HslV4Re, "2")(hslMid(HslRe, "1")(df))
    val parsedCols = withMid.withColumn("__cn", namedStruct)
      .withColumn("__ch1", hexShort)
      .withColumn("__ch2", hexLong)
      .withColumn("__cr1", rgbCol(RgbRe))
      .withColumn("__cr2", rgbCol(RgbV4Re))
      .withColumn("__cs1", hslCol("1"))
      .withColumn("__cs2", hslCol("2"))
    // pick-first as nested when(isNotNull) so every format column is
    // referenced TWICE: CollapseProject then refuses to inline the parse
    // projection into this one (it never duplicates non-cheap exprs), the
    // parse stays its own doConsume, and each method stays under Janino's
    // 64KB limit
    val pick = Seq("__cn", "__ch1", "__ch2", "__cr1", "__cr2", "__cs1", "__cs2")
      .map(col).foldRight(nullRgba) { (c, acc) =>
        when(c.isNotNull, c).otherwise(acc)
      }
    val mids = for (sfx <- Seq("1", "2");
                    p <- Seq("__hv", "__sv", "__lv", "__m2", "__aa", "__bd"))
      yield s"$p$sfx"
    parsedCols.withColumn(outCol, pick)
      .drop("__cn" +: "__ch1" +: "__ch2" +: "__cr1" +: "__cr2" +: "__cs1" +:
        "__cs2" +: mids: _*)
  }
}
