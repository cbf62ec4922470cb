package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object Md5Prefix {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Unsigned value of md5-hex chars [startChar, startChar + nChars)
    * (1-based, nChars <= 15 so the value fits a positive long) — the
    * digest bytes' nibbles read directly, no hex string ever built. */
  def hash(bytes: Array[Byte], startChar: Int, nChars: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(bytes)
    val d = m.digest()
    var v = 0L
    var c = startChar - 1
    val end = c + nChars
    while (c < end) {
      val b = d(c >> 1) & 0xff
      v = (v << 4) | (if ((c & 1) == 0) b >>> 4 else b & 0xf)
      c += 1
    }
    v
  }
}

/** `conv(substring(md5(x), startChar, nChars), 16, 10)::long` as one
  * codegen'd expression — the catalog's portable-hash recipe (md5-hex
  * prefix parsed base-16, shared bit-for-bit with the DuckDB oracles)
  * without the per-row hex-string materialization: the old chain built
  * a 32-char hex string, substring'd it, and string-parsed the slice;
  * this reads the same nibbles straight off the digest bytes
  * (hex char c of md5 = nibble c of the 16 digest bytes). Bit-identical
  * by construction for 1 <= nChars <= 15 (the value stays a positive
  * long; catalog sites use 4/8/13/15). Used on the per-row/per-token
  * sketch and fingerprint paths (u05/u08/u09/u10, t08, t22/t26) where
  * the hex round-trip was measurable; one-shot scalar sites keep the
  * spelled-out chain for readability. */
case class Md5PrefixLong(child: Expression, startChar: Int, nChars: Int)
    extends UnaryExpression {
  require(startChar >= 1 && nChars >= 1 && nChars <= 15 && startChar + nChars <= 33,
    s"md5 prefix out of range: start=$startChar n=$nChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix expects string or binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Md5Prefix.hash(s.getBytes, startChar, nChars)
    case b: Array[Byte] => Md5Prefix.hash(b, startChar, nChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix.hash(${toBytes(c)}, $startChar, $nChars);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  /** Column-level helper: `md5PrefixLong(c, s, n)` ==
    * `conv(substring(md5(c), s, n), 16, 10).cast("long")`. */
  def apply(c: org.apache.spark.sql.Column, startChar: Int, nChars: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftPlanShim.column(
      Md5PrefixLong(org.apache.spark.sql.GraftPlanShim.expression(c), startChar, nChars))
}
