package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout functions: space-filling-curve keys for multi-dimensional
  * clustering. Sorting a table by a Z-order key makes every contiguous
  * file cover a small rectangle in (dim1, dim2) space, so min/max file
  * statistics prune scans on EITHER dimension — the standard layout
  * lever when a 100 TB time-series table is filtered by both time and a
  * second key (user, device, series) and single-column sorting can only
  * serve one of them.
  */
object LayoutFunctions {

  /** Z-order (Morton) key over the low 16 bits of two non-negative
    * dimensions — plain integer bit math, identically replayable in the
    * oracle's SQL.
    */
  def zorder16(x: Column, y: Column): Column =
    GraftBridge.column(ZOrder16(
      GraftBridge.expression(x), GraftBridge.expression(y)))
}

/** Bit-interleave of the low 16 bits of two longs: result bit 2k is
  * x's bit k, bit 2k+1 is y's bit k. Codegen'd; null-intolerant.
  */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @inline private def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var k = 0
    while (k < 16) {
      z |= ((x >> k) & 1L) << (2 * k)
      z |= ((y >> k) & 1L) << (2 * k + 1)
      k += 1
    }
    z
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val k = ctx.freshName("k")
      s"""
         |long $z = 0L;
         |for (int $k = 0; $k < 16; $k++) {
         |  $z |= (($a >> $k) & 1L) << (2 * $k);
         |  $z |= (($b >> $k) & 1L) << (2 * $k + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
