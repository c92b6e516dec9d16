package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused DISTINCT w-shingles of a token array, first-occurrence
  * order — value-identical to
  * `array_distinct(Dedup.shingles(toks, w))` (the higher-order
  * formulation: whole-text fallback for < w tokens, space-joined w-grams
  * otherwise, null tokens skipped with their separator — concat_ws
  * semantics), but one primitive pass instead
  * of interpreted `transform` + per-position `slice` + `concat_ws` trees —
  * those are CodegenFallback in Spark 4.1 and cost O(n·w) boxed evals per
  * document. Used by the decontamination scan, where shingling IS the
  * corpus-side cost.
  *
  * PRECONDITION mirror of the HOF path: distinctness is byte-equality of
  * the joined shingle string.
  */
case class DistinctShingles(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"distinct_shingles needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val nShingles = math.max(1, n - (w - 1))
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      val end = math.min(i + w, n)
      var j = i
      // concat_ws semantics: a null token contributes NOTHING — not even its
      // separator — so the separator is emitted only between non-null tokens
      // ("wrote anything" flag, not position).
      var wrote = false
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (wrote) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          wrote = true
        }
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n"); val nSh = ctx.freshName("nSh")
      val seen = ctx.freshName("seen"); val sb = ctx.freshName("sb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val end = ctx.freshName("end"); val wrote = ctx.freshName("wrote")
      s"""
        int $n = $toks.numElements();
        int $nSh = java.lang.Math.max(1, $n - ${w - 1});
        java.util.LinkedHashSet<$utf8> $seen = new java.util.LinkedHashSet<$utf8>($nSh * 2);
        java.lang.StringBuilder $sb = new java.lang.StringBuilder(64);
        for (int $i = 0; $i < $nSh; $i++) {
          $sb.setLength(0);
          int $end = java.lang.Math.min($i + $w, $n);
          boolean $wrote = false;
          for (int $j = $i; $j < $end; $j++) {
            if (!$toks.isNullAt($j)) {
              if ($wrote) $sb.append(' ');
              $sb.append($toks.getUTF8String($j).toString());
              $wrote = true;
            }
          }
          $seen.add($utf8.fromString($sb.toString()));
        }
        ${ev.value} = new $gad($seen.toArray());
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object DistinctShingles {
  def distinctShingles(tokens: Column, w: Int = 3): Column =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(tokens), w))
}
