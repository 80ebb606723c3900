package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native base64 / hex decode with the reference's EXACT error-detail
 * strings — reference `validators/config.rs:88-111` decodes bytes fields
 * with the Rust `base64` crate (v0.22.1, URL_SAFE engine with
 * `DecodePaddingMode::Indifferent`, falling back to the STANDARD alphabet
 * when the error is `InvalidByte` on `/` or `+`) and the `hex` crate
 * (v0.4.3), and puts each crate's `Display` string into the
 * `bytes_invalid_encoding` error's `encoding_error` context
 * (`errors/types.rs:306-308`; golden strings pinned by
 * `tests/test_json.py:229,261,273`).
 *
 * Both expressions return `struct<bytes: binary, err: string>` with
 * exactly one side set, so the decode runs ONCE per row and the violation
 * branch just reads the `err` field. Interpreter and codegen funnel
 * through the same static method (repo discipline, cf. [[FractionReduce]]).
 *
 * Error-priority model of base64 0.22.1's quad scanner, reproduced here
 * over the UTF-8 bytes of the input (the crate decodes `&str` bytes):
 *  - `=` at quad position 0 or 1 -> `Invalid symbol 61, offset i.`
 *  - any symbol after padding started -> `Invalid symbol b, offset i.`
 *  - byte outside the alphabet -> `Invalid symbol b, offset i.`
 *  - padding present but symbols+pads not a quad multiple -> `Invalid padding`
 *  - symbol count ≡ 1 (mod 4) -> `Invalid input length: n`
 *  - nonzero trailing bits in the last symbol -> `Invalid last symbol b, offset i.`
 */
object BytesDecode {

  private val STD_ALPHABET =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
  private val URL_ALPHABET =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"

  private def table(alphabet: String): Array[Int] = {
    val t = Array.fill(256)(-1)
    var i = 0
    while (i < alphabet.length) { t(alphabet.charAt(i).toInt) = i; i += 1 }
    t
  }
  private val STD_TABLE = table(STD_ALPHABET)
  private val URL_TABLE = table(URL_ALPHABET)

  // --- base64 error model (base64 crate 0.22.1 DecodeError + its Display)
  private final val ERR_BYTE = 0
  private final val ERR_LENGTH = 1
  private final val ERR_LAST_SYMBOL = 2
  private final val ERR_PADDING = 3

  /** (kind, index, byteOrLen) packed; null = ok. */
  private final class B64Result(val bytes: Array[Byte], val errKind: Int,
                                val errIdx: Int, val errArg: Int)

  private def decode64(in: Array[Byte], tab: Array[Int]): B64Result = {
    val n = in.length
    val syms = new Array[Int](n)
    var symCount = 0
    var padCount = 0
    var lastSymIdx = -1
    var lastSymByte = 0
    var i = 0
    while (i < n) {
      val b = in(i) & 0xff
      if (b == '=') {
        // padding only legal at quad positions 2 and 3 of the final quad
        if (i % 4 < 2) return new B64Result(null, ERR_BYTE, i, b)
        padCount += 1
      } else {
        if (padCount > 0) return new B64Result(null, ERR_BYTE, i, b)
        val v = tab(b)
        if (v < 0) return new B64Result(null, ERR_BYTE, i, b)
        syms(symCount) = v
        symCount += 1
        lastSymIdx = i
        lastSymByte = b
      }
      i += 1
    }
    if (padCount > 0 && (symCount + padCount) % 4 != 0)
      return new B64Result(null, ERR_PADDING, 0, 0)
    val rem = symCount % 4
    if (rem == 1)
      return new B64Result(null, ERR_LENGTH, 0, symCount)
    if (rem >= 2) {
      val mask = if (rem == 2) 0x0f else 0x03
      if ((syms(symCount - 1) & mask) != 0)
        return new B64Result(null, ERR_LAST_SYMBOL, lastSymIdx, lastSymByte)
    }
    val outLen = (symCount / 4) * 3 + (rem match {
      case 0 => 0; case 2 => 1; case _ => 2
    })
    val out = new Array[Byte](outLen)
    var s = 0; var o = 0
    while (s + 4 <= symCount) {
      val v = (syms(s) << 18) | (syms(s + 1) << 12) | (syms(s + 2) << 6) | syms(s + 3)
      out(o) = (v >> 16).toByte; out(o + 1) = (v >> 8).toByte; out(o + 2) = v.toByte
      s += 4; o += 3
    }
    if (rem == 2) {
      out(o) = ((syms(s) << 2) | (syms(s + 1) >> 4)).toByte
    } else if (rem == 3) {
      out(o) = ((syms(s) << 2) | (syms(s + 1) >> 4)).toByte
      out(o + 1) = ((syms(s + 1) << 4) | (syms(s + 2) >> 2)).toByte
    }
    new B64Result(out, -1, 0, 0)
  }

  private def renderB64(r: B64Result): String = r.errKind match {
    case ERR_BYTE => s"Invalid symbol ${r.errArg}, offset ${r.errIdx}."
    case ERR_LENGTH => s"Invalid input length: ${r.errArg}"
    case ERR_LAST_SYMBOL => s"Invalid last symbol ${r.errArg}, offset ${r.errIdx}."
    case _ => "Invalid padding"
  }

  /** pydantic's two-engine decode: URL_SAFE first; on `InvalidByte` of
   * `/` or `+` retry STANDARD (`config.rs:91-96`). */
  def base64(s: UTF8String): InternalRow = {
    val in = s.getBytes
    var r = decode64(in, URL_TABLE)
    if (r.bytes == null && r.errKind == ERR_BYTE &&
        (r.errArg == '/' || r.errArg == '+'))
      r = decode64(in, STD_TABLE)
    if (r.bytes != null) new GenericInternalRow(Array[Any](r.bytes, null))
    else new GenericInternalRow(
      Array[Any](null, UTF8String.fromString(renderB64(r))))
  }

  /** Rust `char` debug-escape (the hex crate renders the offending byte
   * as `{:?}` of `byte as char`, i.e. Latin-1): `\0 \t \r \n \\ \'`
   * named, other C0/C1 controls as `\u{hh}` lowercase-hex. */
  private def rustCharDebug(c: Int): String = c match {
    case 0 => "\\0"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case '\n' => "\\n"
    case '\\' => "\\\\"
    case '\'' => "\\'"
    case c if c < 0x20 || (c >= 0x7f && c <= 0x9f) => f"\\u{$c%x}"
    case c => c.toChar.toString
  }

  private def hexVal(b: Int): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** hex crate 0.4.3: odd length first, then the first (left-to-right)
   * invalid byte with its position. */
  def hex(s: UTF8String): InternalRow = {
    val in = s.getBytes
    val n = in.length
    if (n % 2 != 0)
      return new GenericInternalRow(
        Array[Any](null, UTF8String.fromString("Odd number of digits")))
    val out = new Array[Byte](n / 2)
    var i = 0
    while (i < n) {
      val v = hexVal(in(i) & 0xff)
      if (v < 0)
        return new GenericInternalRow(Array[Any](null, UTF8String.fromString(
          s"Invalid character '${rustCharDebug(in(i) & 0xff)}' at position $i")))
      if (i % 2 == 0) out(i / 2) = (v << 4).toByte
      else out(i / 2) = (out(i / 2) | v).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](out, null))
  }

  val resultType: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = true),
    StructField("err", StringType, nullable = true)))

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnShim

  def base64Col(s: Column): Column =
    ColumnShim.column(Base64PydanticDecode(ColumnShim.expression(s)))
  def hexCol(s: Column): Column =
    ColumnShim.column(HexPydanticDecode(ColumnShim.expression(s)))
}

abstract class BytesDecodeExpr extends UnaryExpression {
  override def dataType: DataType = BytesDecode.resultType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  protected def method: String
  override def nullSafeEval(v: Any): Any = null // overridden
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BytesDecode.$method($s);")
}

/** `base64_pydantic_decode(str)` -> struct<bytes, err> (see [[BytesDecode]]). */
case class Base64PydanticDecode(child: Expression) extends BytesDecodeExpr {
  override def prettyName: String = "base64_pydantic_decode"
  override protected def method: String = "base64"
  override def nullSafeEval(v: Any): Any =
    BytesDecode.base64(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Base64PydanticDecode =
    copy(child = c)
}

/** `hex_pydantic_decode(str)` -> struct<bytes, err> (see [[BytesDecode]]). */
case class HexPydanticDecode(child: Expression) extends BytesDecodeExpr {
  override def prettyName: String = "hex_pydantic_decode"
  override protected def method: String = "hex"
  override def nullSafeEval(v: Any): Any =
    BytesDecode.hex(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): HexPydanticDecode =
    copy(child = c)
}
