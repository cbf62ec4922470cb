package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Add, And, Attribute, AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr, EvalMode, Expression, ExpressionInfo, If, IsNull, Literal, ShiftRight, ShiftRightUnsigned, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, LongType}
import org.apache.spark.sql.types.Decimal

/** 128-bit fixed-point decimal SUM — the scale fix for the catalog's
  * steepest per-unit-cost entries (q37/q71, VERDICT r8 #2).
  *
  * Spark's built-in `Sum` over a decimal input widens the buffer to
  * precision+10; past precision 18 that buffer is no longer long-backed,
  * so every row's update allocates and adds `java.math.BigDecimal`s —
  * the dominant cost of a power-sum scan like q37 (seven such sums per
  * row) and measured super-linear under memory pressure at 10x data.
  *
  * This aggregate keeps the SAME exact arithmetic in pure long math:
  * the input decimal (precision <= 18, so long-backed) contributes its
  * unscaled long, accumulated into a two-long int128 with carry
  * propagation — the textbook unsigned-add carry trick, all
  * codegen-friendly 64-bit ops in the whole-stage-codegen update loop,
  * three flat words in the UnsafeRow buffer. int128 holds sums of 2^63
  * max-magnitude unscaled values for 2^64 rows — unconditionally exact
  * at any feasible scale, so unlike the widened-decimal Sum there is no
  * per-partial overflow regime at all (2^127 / 10^8-scaled-1e10-values
  * ~ 1.7e19 rows before wrap). The final once-per-group conversion
  * rebuilds the exact BigDecimal from the int128 at the input's scale
  * (Decimal(38, s)), making the result bit-identical to Spark's own
  * decimal Sum wherever that Sum does not overflow — the DuckDB-oracle
  * hash parity contract of [[graft.Det.dsum]] (Tables.scala), whose
  * decimal(28,8) route this replaces on the hot entries.
  *
  * Null semantics mirror `Sum`: null inputs are skipped, an
  * empty/all-null group yields null (tracked by the isEmpty flag).
  *
  * The child is the already-scaled UNSCALED LONG (fixed-point at
  * `scale` digits): `UnscaledValue(decimalCol)` for long-backed decimal
  * inputs, [[DoubleToScaled]] for double inputs — both zero-allocation
  * per-row conversions, keeping the whole update path BigDecimal-free
  * (the Cast-to-decimal route allocates via Double.toString per row;
  * measured 21 s vs 0.8 s for plain long sums on 6M rows x 7 sums). */
case class Sum128(child: Expression, scale: Int) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true

  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_sum128"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sum128 needs a pre-scaled long (unscaled value) input, got $other")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // int128 += sext(x): newLo = lo + x (wrapping); carry-out of the
  // unsigned 64-bit add = ((lo & x) | ((lo | x) & ~newLo)) >>> 63;
  // newHi = hi + (x >> 63) + carry (x sign-extended to 128 bits).
  private def add128(
      curHi: Expression, curLo: Expression, x: Expression, xHi: Expression
  ): (Expression, Expression) = {
    def wadd(a: Expression, b: Expression) = Add(a, b, EvalMode.LEGACY)
    val newLo = wadd(curLo, x)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(curLo, x),
        BitwiseAnd(BitwiseOr(curLo, x), BitwiseNot(newLo))),
      Literal(63))
    val newHi = wadd(wadd(curHi, xHi), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val (newHi, newLo) = add128(hi, lo, x, ShiftRight(x, Literal(63)))
    Seq(newHi, newLo, And(isEmpty, IsNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, lo.right, hi.right)
    Seq(newHi, newLo, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, dataType), Int128ToDecimal(hi, lo, scale))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 = copy(child = newChildren.head)
}

/** Exact double -> fixed-point(scale) long, allocation-free: decompose
  * v = m * 2^e from the raw bits, multiply the 53-bit mantissa by
  * 5^scale into an exact int128 (Math.multiplyHigh), then shift by
  * e+scale with HALF_UP rounding on the shifted-out remainder — i.e.
  * round_half_up(|v| * 10^scale) of the TRUE binary value, in ~20 long
  * ops.
  *
  * Semantics vs Cast(double -> decimal(p,s)): Spark's cast rounds the
  * SHORTEST-STRING decimal rendering of the double (scala
  * BigDecimal(d) goes through Double.toString); this rounds the exact
  * binary value. The two can only disagree when the exact value and its
  * <=17-digit rendering straddle a 0.5e-s grid boundary — a window of
  * relative width ~2^-53 around the boundary, unreachable for data
  * derived from fixed-point generators (every Det-summed column here is
  * a 2-4-decimal value whose distance from the boundary is ~1e-3 scaled
  * units). Det128ParitySpec pins corpus-wide bit-parity vs dsum.
  * Magnitude contract is LOUD like the ANSI cast: the scaled value must
  * fit decimal(18,s) or this throws ArithmeticException. */
case class DoubleToScaled(child: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(scale >= 0 && scale <= 18, s"scale $scale out of [0, 18]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_to_scaled"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_double_to_scaled needs a double input, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    Sum128.scaledLong(v.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sum128.scaledLong($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): DoubleToScaled =
    copy(child = newChild)
}

/** Once-per-group scalar: reassemble the exact int128 (hi, lo) into a
  * Decimal(38, scale). Off the per-row hot path by construction —
  * HashAggregateExec evaluates it only in the final result projection. */
case class Int128ToDecimal(hiExpr: Expression, loExpr: Expression, scale: Int)
    extends Expression {

  override def children: Seq[Expression] = Seq(hiExpr, loExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_int128_to_decimal"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    Sum128.toDecimal(
      hiExpr.eval(input).asInstanceOf[Long],
      loExpr.eval(input).asInstanceOf[Long], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = hiExpr.genCode(ctx)
    val l = loExpr.genCode(ctx)
    ev.copy(
      code = code"""
        |${h.code}
        |${l.code}
        |org.apache.spark.sql.types.Decimal ${ev.value} =
        |  graft.functions.Sum128.toDecimal(${h.value}, ${l.value}, $scale);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Int128ToDecimal =
    copy(hiExpr = newChildren(0), loExpr = newChildren(1))
}

object Sum128 {
  /** Exact int128 -> Decimal(38, scale): BigInteger from the two words
    * (hi signed, lo unsigned), then the BigDecimal at the input scale.
    * Correctly-rounded double conversion afterwards is the caller's
    * Cast, identical to casting Spark's own decimal Sum result. */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(hi)
    bb.putLong(lo)
    val bi = new java.math.BigInteger(bb.array())
    Decimal(new java.math.BigDecimal(bi, scale), 38, scale)
  }

  private final val Max18 = 999999999999999999L // decimal(18,_) unscaled bound
  // 5^s for s in 0..18 (5^18 < 2^42; m * 5^s < 2^95 — exact in int128)
  private final val Pow5: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 5L; i += 1 }
    a
  }

  /** round_half_up(v * 10^scale) of the exact binary value of v — see
    * [[DoubleToScaled]]. Pure long math, no allocation; throws (like an
    * ANSI cast) on non-finite input or a scaled magnitude over 18
    * digits. */
  def scaledLong(v: Double, scale: Int): Long = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      throw new ArithmeticException(s"graft_double_to_scaled: non-finite input $v")
    val bits = java.lang.Double.doubleToRawLongBits(v)
    val neg = bits < 0L
    val be = ((bits >>> 52) & 0x7FFL).toInt
    var m = bits & 0x000FFFFFFFFFFFFFL
    var e = 0
    if (be == 0) e = -1074 // subnormal
    else { m |= 1L << 52; e = be - 1075 }
    if (m == 0L) return 0L
    // |v| * 10^s = (m * 5^s) * 2^(e+s); P = m * 5^s < 2^95 exact in int128
    val p5 = Pow5(scale)
    val pHi = Math.multiplyHigh(m, p5)
    val pLo = m * p5
    val k = -(e + scale) // |v| * 10^s = P / 2^k
    var q = 0L
    if (k <= 0) {
      // left-shift case (|v| * 10^s = P << -k): exact, no rounding —
      // reachable for small scales with large-magnitude integers
      // (e.g. scale 0, v = 2^55). Guard the shift against wrap.
      val sh = -k
      if (pHi != 0L || sh >= 63 || (sh > 0 && (pLo >>> (63 - sh)) != 0L))
        throw new ArithmeticException(s"graft_double_to_scaled: magnitude overflow $v")
      q = pLo << sh
    } else if (k < 64) {
      if ((pHi >>> k) != 0L)
        throw new ArithmeticException(s"graft_double_to_scaled: magnitude overflow $v")
      q = (pHi << (64 - k)) | (pLo >>> k)
      // HALF_UP on the shifted-out k-bit remainder (magnitude)
      if ((pLo & ((1L << k) - 1L)) >= (1L << (k - 1))) q += 1L
    } else if (k == 64) {
      q = pHi
      if (pLo < 0L) q += 1L // remainder = unsigned pLo >= 2^63
    } else if (k < 128) {
      val kk = k - 64
      q = pHi >>> kk
      // remainder >= 2^(k-1) iff its hi word >= 2^(kk-1) (lo bits only add)
      if ((pHi & ((1L << kk) - 1L)) >= (1L << (kk - 1))) q += 1L
    } // k >= 128: |v| * 10^s < 2^-33 — rounds to 0
    if (q < 0L || q > Max18)
      throw new ArithmeticException(s"graft_double_to_scaled: magnitude overflow $v")
    if (neg) -q else q
  }

  /** Aggregate Column over a DOUBLE column, fixed-pointed at `scale`
    * digits by [[DoubleToScaled]] — the whole per-row path is long
    * math, no decimal Cast. Result type decimal(38, scale). */
  def sumDoubleFixed(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftPlanShim.column(
      Sum128(DoubleToScaled(
        org.apache.spark.sql.GraftPlanShim.expression(
          c.cast(org.apache.spark.sql.types.DoubleType)), scale),
        scale).toAggregateExpression())

  /** Aggregate Column over a long-backed decimal column: int128 sum of
    * its unscaled longs. The column's decimal type must be statically
    * known (e.g. an explicit cast), since the output scale is fixed at
    * plan-build time. */
  def sumDecimal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val e = org.apache.spark.sql.GraftPlanShim.expression(c)
    val scale = e.dataType match {
      case d: DecimalType => d.scale
      case other => throw new IllegalArgumentException(
        s"graft_sum128 needs a decimal column, got $other")
    }
    org.apache.spark.sql.GraftPlanShim.column(
      Sum128(UnscaledValue(e), scale).toAggregateExpression())
  }

  val info = new ExpressionInfo(classOf[Sum128].getName, "graft_sum128")
  val builder: Seq[Expression] => Expression = exprs =>
    Sum128(UnscaledValue(exprs.head), exprs.head.dataType match {
      case d: DecimalType => d.scale
      case _ => 0
    }).toAggregateExpression()

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_sum128", builder, "built-in")
}
