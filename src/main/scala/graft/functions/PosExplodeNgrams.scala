package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True Catalyst Generator (the explode-family extension point, SURVEY
  * §2.2 UD* row): `graft_posexplode_ngrams(text, n)` fans each document
  * out to one row per word n-gram with its 0-based position — the
  * tokenize-then-posexplode idiom as ONE native table-generating
  * function. Unlike u03's typed flatMap (which leaves the relational
  * layer for a Dataset lambda), this stays a relational Generate node:
  * Catalyst prunes columns through it, and the per-row fan-out never
  * materializes an intermediate array column.
  *
  * eval-mode only (CodegenFallback), like most built-in generators'
  * slow path; the Generate operator itself pipelines inside the stage.
  */
case class PosExplodeNgrams(child: Expression, nExpr: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (t1, t2) => TypeCheckResult.TypeCheckFailure(
        s"graft_posexplode_ngrams expects (string, int), got ($t1, $t2)")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType)))

  override def prettyName: String = "graft_posexplode_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    val nVal = nExpr.eval(input)
    if (text == null || nVal == null) return Iterator.empty
    val n = nVal.asInstanceOf[Int]
    if (n <= 0) return Iterator.empty
    val toks = text.asInstanceOf[UTF8String].toString.split(' ')
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PosExplodeNgrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object PosExplodeNgrams {
  val info = new ExpressionInfo(classOf[PosExplodeNgrams].getName, "graft_posexplode_ngrams")
  val builder: Seq[Expression] => Expression = exprs => PosExplodeNgrams(exprs.head, exprs(1))

  /** Session-scoped registration (harness sessions are built without the
    * extensions conf; production deploys use [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_posexplode_ngrams", builder, "built-in")
}

/** CHARACTER n-gram generator: one row per length-n codepoint window of
  * `child`, bit-identical to `explode(transform(sequence(1, length(t) -
  * (n-1)), i => substr(t, i, n)))` on any string with at least n chars
  * (and empty below that, like the exploded empty array).
  *
  * Why it exists (r15 optimization pass, guide §1.2 "per-task work"):
  * `UTF8String.substring(start, until)` walks BYTES FROM ZERO to find
  * the start codepoint, so the substr-per-position spelling is O(len²)
  * byte steps per document — t14's trigram stream paid ~125k steps for
  * a 500-char doc, twice (the count pass and the probe pass). This
  * generator walks the byte array ONCE, records codepoint starts, and
  * emits each window as a zero-copy slice over one shared byte array:
  * O(len) per document and no per-window array/sequence
  * materialization. eval-mode like [[PosExplodeNgrams]]; the Generate
  * operator pipelines inside the stage either way, and the O(len²)→
  * O(len) swap dwarfs the lost whole-stage fusion of the explode form
  * (measured on t14; see OPTIMIZATION_r15.md). */
case class CharNgrams(child: Expression, nExpr: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (t1, t2) => TypeCheckResult.TypeCheckFailure(
        s"graft_char_ngrams expects (string, int), got ($t1, $t2)")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("g", StringType)))

  override def prettyName: String = "graft_char_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    val nVal = nExpr.eval(input)
    if (text == null || nVal == null) return Iterator.empty
    val n = nVal.asInstanceOf[Int]
    if (n <= 0) return Iterator.empty
    val bytes = text.asInstanceOf[UTF8String].getBytes
    // Offsets of codepoint starts, stepped with the SAME lead-byte widths
    // UTF8String.substring uses (numBytesForFirstByte) so the bit-identity
    // claim holds even on malformed UTF-8 — counting non-continuation
    // bytes diverges there (a truncated multi-byte lead's trailing ASCII
    // counts extra chars that substr skips). The end sentinel clamps the
    // last window exactly like substring clamps `until` at numBytes.
    var chars = 0
    var i = 0
    while (i < bytes.length) {
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    if (chars < n) return Iterator.empty
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      starts(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(chars) = bytes.length
    (0 to chars - n).iterator.map { k =>
      InternalRow(UTF8String.fromBytes(bytes, starts(k), starts(k + n) - starts(k)))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNgrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
