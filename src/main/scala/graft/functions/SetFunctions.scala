package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native set-operation expressions for the dedup hot path.
  *
  * `array_intersect`/`array_union` build a hash set per evaluated pair —
  * inside a candidate-pair join that is millions of allocations. On
  * SORTED distinct long arrays (what [[graft.operators.Dedup.hashedShingles]]
  * emits) the intersection size is a single allocation-free merge scan;
  * the union size follows as |A| + |B| − |A∩B|. Bit-identical Jaccard
  * values to the hash-set form — pinned by SetFunctionsSpec.
  */
object SetFunctions {

  /** COUNT of common elements of two sorted distinct long arrays. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "sorted_intersect_count"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires two array<bigint> arguments, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val n = x.numElements(); val m = y.numElements()
      while (i < n && j < m) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi == yj) { c += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |final int $n = $a.numElements(), $m = $b.numElements();
           |while ($i < $n && $j < $m) {
           |  final long $xi = $a.getLong($i);
           |  final long $yj = $b.getLong($j);
           |  if ($xi == $yj) { $c++; $i++; $j++; }
           |  else if ($xi < $yj) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    CatalystBridge.column(SortedIntersectCount(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
