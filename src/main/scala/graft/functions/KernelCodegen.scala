package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}

/** Real-codegen bridges for graft's kernel expressions — the upgrade
  * that retires `CodegenFallback` across the sketch/dedup/text tier
  * (r16 verdict item 2's generalization). A fallback expression costs
  * every row an InternalRow boxing AND breaks whole-stage codegen for
  * the projection it sits in; these traits instead generate a direct
  * call to the expression's own `nullSafeEval` through a public
  * bridge — zero logic duplication, no row boxing, and the
  * expression participates in whole-stage subexpression elimination.
  *
  * Null discipline: when the expression declares `nullable` the
  * generated code null-checks the kernel result (an eval may return
  * NULL from non-null input — the RobotsCrawlDelay/RegisteredDomain
  * class); a non-nullable expression assigns directly (its `isNull`
  * may be the FalseLiteral, which must never be assigned). */
trait UnaryKernelCodegen extends UnaryExpression {
  /** Public bridge: generated code cannot call protected members. */
  final def kernelEval(input: Any): Any = nullSafeEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, getClass.getName)
    val jt = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      if (nullable) {
        val r = ctx.freshName("kr")
        s"""
        Object $r = $ref.kernelEval($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ($jt) $r; }"""
      } else s"${ev.value} = ($jt) $ref.kernelEval($c);")
  }
}

trait BinaryKernelCodegen extends BinaryExpression {
  final def kernelEval(l: Any, r: Any): Any = nullSafeEval(l, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, getClass.getName)
    val jt = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (nullable) {
        val r = ctx.freshName("kr")
        s"""
        Object $r = $ref.kernelEval($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ($jt) $r; }"""
      } else s"${ev.value} = ($jt) $ref.kernelEval($a, $b);")
  }
}

trait TernaryKernelCodegen extends TernaryExpression {
  final def kernelEval(a: Any, b: Any, c: Any): Any = nullSafeEval(a, b, c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, getClass.getName)
    val jt = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      if (nullable) {
        val r = ctx.freshName("kr")
        s"""
        Object $r = $ref.kernelEval($a, $b, $c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ($jt) $r; }"""
      } else s"${ev.value} = ($jt) $ref.kernelEval($a, $b, $c);")
  }
}
