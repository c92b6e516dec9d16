package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard similarity of two ASCENDING-SORTED distinct long arrays — a
  * single merge pass, zero allocation, primitive comparisons only.
  *
  * Used by [[graft.ext.Dedup.prefixJaccardPairs]] after tokens are mapped
  * to dense integer ids: `|A∩B| / (|A|+|B|−|A∩B|)` over identical id sets
  * yields the exact same double as the string-set formulation (same integer
  * ratio), at ~10× less cost per pair than hashing UTF8 strings into a set
  * ([[JaccardSim]] — which remains the general unsorted-string-array form).
  * Inputs MUST be sorted ascending and element-distinct; output is garbage
  * otherwise (no runtime check — this sits in a multi-million-pair loop).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"sorted_jaccard needs two array<long>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return java.lang.Double.valueOf(0.0)
    var i = 0; var j = 0; var hits = 0
    while (i < na && j < nb) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va == vb) { hits += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(hits.toDouble / (na + nb - hits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val hits = ctx.freshName("hits")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      s"""
        int $na = $a.numElements();
        int $nb = $b.numElements();
        if ($na == 0 && $nb == 0) {
          ${ev.value} = 0.0;
        } else {
          int $i = 0; int $j = 0; int $hits = 0;
          while ($i < $na && $j < $nb) {
            long $va = $a.getLong($i); long $vb = $b.getLong($j);
            if ($va == $vb) { $hits++; $i++; $j++; }
            else if ($va < $vb) { $i++; } else { $j++; }
          }
          ${ev.value} = (double) $hits / ($na + $nb - $hits);
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
    copy(left = l, right = r)
}

object SortedJaccard {
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
