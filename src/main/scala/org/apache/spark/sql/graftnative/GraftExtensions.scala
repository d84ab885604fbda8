/** [[org.apache.spark.sql.SparkSessionExtensions]] wiring for the graft
  * native expressions: SQL function surface + an optimizer rule that fuses
  * the interpreted higher-order dot-product idiom into a codegen loop.
  *
  * Load with `.config("spark.sql.extensions",
  * "org.apache.spark.sql.graftnative.GraftExtensions")` (or
  * `.withExtensions`) — the mechanism Spark reserves for engine-level
  * extensions, so a cluster admin can turn any session into a graft-aware
  * one without code changes.
  */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getName, name)

  private def intLit(e: Expression, arg: String): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info(classOf[SimHash60], "graft_simhash60"),
      (es: Seq[Expression]) => SimHash60(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_token_hash60"),
      info(classOf[TokenHash60], "graft_token_hash60"),
      (es: Seq[Expression]) => TokenHash60(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hash60"),
      info(classOf[ShingleHash60], "graft_shingle_hash60"),
      (es: Seq[Expression]) => ShingleHash60(es(0), intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info(classOf[MinHashSig], "graft_minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0), intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_gopher_metrics"),
      info(classOf[GopherMetrics], "graft_gopher_metrics"),
      (es: Seq[Expression]) => GopherMetrics(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_agg"),
      info(classOf[MinHashAgg], "graft_minhash_agg"),
      (es: Seq[Expression]) => new MinHashAgg(es(0), intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_repetition_metrics"),
      info(classOf[RepetitionMetrics], "graft_repetition_metrics"),
      (es: Seq[Expression]) => RepetitionMetrics(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_window_hash60"),
      info(classOf[WindowHash60], "graft_window_hash60"),
      (es: Seq[Expression]) => WindowHash60(es(0), intLit(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_bigram_hash60"),
      info(classOf[BigramHash60], "graft_bigram_hash60"),
      (es: Seq[Expression]) => BigramHash60(es(0))))
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}

/** Optimizer rule: `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  * (acc, v) -> acc + v)` → [[DotProductZip]].
  *
  * The declarative idiom is how a user naturally writes a dot product with
  * builtin functions, but every element costs two interpreted lambda calls
  * with boxing (higher-order functions are CodegenFallback). The fused
  * expression is one primitive codegen loop with IDENTICAL semantics,
  * including the null corners: `zip_with` pads the shorter array with
  * nulls and `+`/`*` propagate them, so any length mismatch or null
  * element nulls the whole sum — [[DotProductZip]] reproduces exactly
  * that (unlike [[DotProduct]], which documents truncation and is only
  * used where the caller guarantees equal lengths).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVars(p: (Expression, Expression), v1: NamedLambdaVariable,
      v2: NamedLambdaVariable): Boolean = p match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
        (a.exprId == v2.exprId && b.exprId == v1.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, _),
            Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
        if sameVars((mx, my), zx, zy) &&
          aa.exprId == ma.exprId && av.exprId == mv.exprId &&
          fv.exprId == ff.exprId &&
          l.dataType.isInstanceOf[ArrayType] &&
          l.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          r.dataType.isInstanceOf[ArrayType] &&
          r.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      DotProductZip(l, r)
  }
}

/** Dot product with the exact semantics of the `aggregate(zip_with(...))`
  * idiom it replaces: result is NULL when the lengths differ (zip_with's
  * null padding) or any paired element is null; otherwise the left-fold
  * sum in index order (bit-identical float addition order).
  */
case class DotProductZip(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_zip"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductZip =
    copy(left = newLeft, right = newRight)
}
