package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-space token counter — the zero-allocation twin of
  * `size(split(text, " "))`, which materializes the full token ARRAY
  * (one UTF8String slice per token plus the array cell) only to read
  * its length. Token count under split semantics is exactly
  * #delimiters + 1 — split with an unbounded limit keeps leading/
  * trailing/consecutive empties, so "" has 1 token, "a  b" has 3 —
  * and the delimiter is ASCII 0x20, which in UTF-8 can never appear
  * inside a multi-byte sequence (continuation bytes have the high bit
  * set), so a single byte scan over the raw UTF8String is exact for
  * any unicode content. One pass, no allocation, stays inside
  * whole-stage codegen.
  *
  * The DuckDB oracle keeps `len(string_split(text, ' '))` — same
  * count by the same semantics — so entries swapping this in (t06)
  * stay hash-green (CountTokensSpec pins corpus-wide parity against
  * the split form; the probe measures the win). */
case class CountTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_count_tokens expects a string arg, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_tokens"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var cnt = 1L
    var i = 0
    while (i < n) { if (u.getByte(i) == 0x20) cnt += 1; i += 1 }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (cnt, n, i) = (ctx.freshName("cnt"), ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |long $cnt = 1L;
         |int $n = $c.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.getByte($i) == (byte) 0x20) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountTokens =
    copy(child = newChild)
}
