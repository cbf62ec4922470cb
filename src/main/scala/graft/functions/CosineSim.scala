package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for cosine similarity over two double
  * arrays — SURVEY §4.2's candidate (c): where the hot ANN verify path
  * would otherwise run interpreted higher-order functions (aggregate/
  * zip_with are not codegen'd) or a boxing Scala UDF, this compiles to a
  * tight primitive loop inside whole-stage codegen.
  *
  * Numerics are deliberately IDENTICAL to the aggregate/zip_with
  * formulation in SimilarityQueries and to DuckDB's list_cosine_similarity
  * on DOUBLE[]: one pass accumulating dot/normA/normB in index order,
  * then dot / (sqrt(na)*sqrt(nb)), clamped to [-1, 1] — so results are
  * bit-exact across all three implementations (the v05 oracle relies on
  * this).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_sim expects two array<double> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    math.min(1.0, math.max(-1.0, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i, c) = (ctx.freshName("dot"), ctx.freshName("na"),
        ctx.freshName("nb"), ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("c"))
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = $a.getDouble($i);
         |  double yi = $b.getDouble($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |double $c = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |${ev.value} = java.lang.Math.min(1.0, java.lang.Math.max(-1.0, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val info = new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine_sim")
  val builder: Seq[Expression] => Expression = exprs => CosineSim(exprs.head, exprs(1))

  /** Session-scoped registration (harness sessions are built without the
    * extensions conf; production deploys use [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_cosine_sim", builder, "built-in")
}

/** SparkSessionExtensions entry point:
  * --conf spark.sql.extensions=graft.functions.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine_sim"), CosineSim.info, CosineSim.builder))
    ext.injectFunction((FunctionIdentifier("graft_posexplode_ngrams"),
      PosExplodeNgrams.info, PosExplodeNgrams.builder))
    ext.injectFunction((FunctionIdentifier("graft_bottomk"),
      BottomKHashes.info, BottomKHashes.builder))
  }
}
