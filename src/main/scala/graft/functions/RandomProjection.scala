package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native fused sign-matrix random projection (Achlioptas 2003, the q133
  * operator): dIn→`dOut` integer-exact JL reduction. Component j of the
  * input is floor-quantized at 1e-6 into a BIGINT, multiplied by the ±1
  * sign `1 − 2·(((j·1000003 + i)·2654435761) mod 1000000007 mod 2)` for
  * output dim i, and summed left-to-right — bit-identical to the
  * [[graft.ext.Similarity.randomProject]] HOF formulation (kept as the
  * reference for the equality spec), which pays d×dOut interpreted lambda
  * evaluations per row (HOFs are CodegenFallback in Spark 4.x): at
  * d=64, dOut=16 that is ~1024 boxed evals/row — measured as the whole
  * q133 wall (a zero-exchange, pure-projection scan). This expression is
  * one primitive loop: O(d×dOut) long multiply-adds, zero allocation
  * beyond the output array.
  *
  * Null semantics mirror the HOF exactly: a null INPUT array yields a
  * null output (nullSafeEval); a null ELEMENT nulls every output sum
  * (each output dim aggregates over all j), so the output is an array of
  * `dOut` nulls.
  */
case class RandomProjection(child: Expression, dOut: Int)
    extends UnaryExpression {

  require(dOut >= 1 && dOut <= 4096, s"dOut must be in [1,4096], got $dOut")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "random_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_projection needs array<float|double>, got $other")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var anyNull = false
    var j = 0
    while (j < n && !anyNull) { if (vec.isNullAt(j)) anyNull = true; j += 1 }
    if (anyNull) {
      new GenericArrayData(Array.fill[Any](dOut)(null))
    } else {
      val out = new Array[Long](dOut)
      j = 0
      while (j < n) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val q = Math.floor(x * 1000000.0).toLong
        var i = 0
        while (i < dOut) {
          val sign = 1L - 2L * ((j.toLong * 1000003L + i) * 2654435761L % 1000000007L % 2L)
          out(i) += q * sign
          i += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val get = if (isFloat) s"(double) $vec.getFloat" else s"$vec.getDouble"
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val q = ctx.freshName("q")
      val anyNull = ctx.freshName("anyNull"); val out = ctx.freshName("out")
      val sign = ctx.freshName("sign")
      val gad = classOf[GenericArrayData].getName
      s"""
        int $n = $vec.numElements();
        boolean $anyNull = false;
        for (int $j = 0; $j < $n && !$anyNull; $j++) {
          if ($vec.isNullAt($j)) $anyNull = true;
        }
        if ($anyNull) {
          ${ev.value} = new $gad(new Object[$dOut]);
        } else {
          long[] $out = new long[$dOut];
          for (int $j = 0; $j < $n; $j++) {
            long $q = (long) Math.floor($get($j) * 1000000.0);
            for (int $i = 0; $i < $dOut; $i++) {
              long $sign = 1L - 2L * (((long) $j * 1000003L + $i) * 2654435761L % 1000000007L % 2L);
              $out[$i] += $q * $sign;
            }
          }
          ${ev.value} = new $gad($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProjection =
    copy(child = newChild)
}

object RandomProjection {
  def randomProjection(vec: Column, dOut: Int): Column =
    ColumnBridge.column(RandomProjection(ColumnBridge.expression(vec), dOut))
}
