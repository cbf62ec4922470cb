package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 8-permutation salted-md5 MinHash over a document's word-trigram
  * shingles, as ONE eval call per document — the st21/st23 band
  * derivation's hot kernel (guide §1.2 per-task work).
  *
  * Input: the split-on-space token array. Output: array<long>(8) of
  * per-salt minima, bit-identical to the staged HOF spelling it
  * replaces:
  *
  *   aggregate(
  *     array_distinct(transform(sequence(1, size(tk) - 2),
  *       i -> concat_ws(" ", tk[i], tk[i+1], tk[i+2]))),
  *     array(maxLong x 8),
  *     (acc, t) -> zip_with(acc, [conv(substring(md5(concat("s:", t)),
  *                                     1, 8), 16, 10)::long | s <- 0..7],
  *                          (a, b) -> least(a, b)))
  *
  * Why: every lambda there runs INTERPRETED (HOFs don't codegen), so per
  * shingle the old form paid 3 boxed element_at calls + a concat_ws
  * alloc + 8 x (UTF8String concat alloc, md5 via a 32-char hex string,
  * substring alloc, conv string-parse, long boxing) plus two 8-wide
  * array allocations for the zip_with fold. This kernel does the same
  * math in one tight JVM loop: one reused MessageDigest, salt and
  * shingle bytes fed to the digest directly (md5 of a string concat IS
  * the md5 of the concatenated UTF-8 bytes), the 32-bit prefix read
  * from the first 4 digest bytes (conv(substring(hex,1,8),16,10) is
  * exactly the unsigned big-endian value of bytes 0..3), and minima
  * tracked in a local long[8].
  *
  * Semantics preserved per element: trigram text built with
  * UTF8String.concatWs (the same kernel concat_ws uses); duplicate
  * shingles skipped via an exact per-doc HashSet — array_distinct's
  * only effect on a min-fold is skipping repeat work, min(x, x) = x.
  * Null token array -> null (the HOF chain is null-propagating).
  * Fewer than 3 tokens -> the empty-fold accumulator (all maxLong) —
  * the one spot this is DEFINED where the old spelling was not: its
  * sequence(1, size-2) turns descending below size 3 and element_at(0)
  * throws, so no corpus this engine has ever run carries such a doc
  * (the DuckDB oracle's range() is empty-safe and never disagreed).
  *
  * eval-only (CodegenFallback): one call per document, so the fallback
  * boundary costs per-doc, not per-shingle; the loop inside is already
  * monomorphic JVM code. */
case class SaltedMinHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_salted_minhash expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_salted_minhash"

  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val salts: Array[Array[Byte]] =
    (0 until 8).map(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  @transient private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(8)(Long.MaxValue)
    if (n >= 3) {
      val md = digest
      val out = new Array[Byte](16)
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= n - 3) {
        val sh = UTF8String.concatWs(space,
          toks.getUTF8String(i), toks.getUTF8String(i + 1), toks.getUTF8String(i + 2))
        if (seen.add(sh)) {
          val bytes = sh.getBytes
          var s = 0
          while (s < 8) {
            md.reset()
            md.update(salts(s))
            md.update(bytes)
            md.digest(out, 0, 16)
            val h = ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
              ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
            if (h < mins(s)) mins(s) = h
            s += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): SaltedMinHash =
    copy(child = newChild)
}
