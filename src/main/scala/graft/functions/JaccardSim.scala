package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Jaccard similarity of two DISTINCT-element string arrays.
  *
  * `|A∩B| / |A∪B|` computed as overlap counting — one hash set over the
  * smaller side, one scan of the larger — instead of
  * `size(array_intersect)/size(array_union)`, which allocates two result
  * arrays and two lookup structures per pair.
  *
  * Preconditions & deliberate edge semantics (vs the HOF formulation):
  * inputs MUST be element-distinct (array_distinct upstream) and contain no
  * NULL elements — tokenizer output (`split`) satisfies both. Under those
  * preconditions values are identical to the intersect/union formulation
  * (exact integer ratio → double). Outside them they diverge by design:
  * both-empty returns 0.0 (not the SQL 0/0 NULL — "no tokens" reads as
  * "not similar" in a dedup pipeline), and null elements count toward the
  * union but never the intersection, whereas array_intersect/array_union
  * treat NULL as a matchable value.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"jaccard_sim needs two array<string>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[ArrayData]
    var b = r.asInstanceOf[ArrayData]
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return java.lang.Double.valueOf(0.0)
    val set = new java.util.HashSet[Any](Math.max(8, na * 2))
    var i = 0
    while (i < na) { if (!a.isNullAt(i)) set.add(a.getUTF8String(i)); i += 1 }
    var hits = 0
    var j = 0
    while (j < nb) {
      if (!b.isNullAt(j) && set.contains(b.getUTF8String(j))) hits += 1
      j += 1
    }
    java.lang.Double.valueOf(hits.toDouble / (na + nb - hits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ad = classOf[ArrayData].getName
      val a = ctx.freshName("a"); val b = ctx.freshName("b"); val t = ctx.freshName("t")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val set = ctx.freshName("set"); val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
        $ad $a = $l; $ad $b = $r;
        if ($a.numElements() > $b.numElements()) { $ad $t = $a; $a = $b; $b = $t; }
        int $na = $a.numElements();
        int $nb = $b.numElements();
        if ($na == 0 && $nb == 0) {
          ${ev.value} = 0.0;
        } else {
          java.util.HashSet $set = new java.util.HashSet(java.lang.Math.max(8, $na * 2));
          for (int $i = 0; $i < $na; $i++) {
            if (!$a.isNullAt($i)) $set.add($a.getUTF8String($i));
          }
          int $hits = 0;
          for (int $i = 0; $i < $nb; $i++) {
            if (!$b.isNullAt($i) && $set.contains($b.getUTF8String($i))) $hits++;
          }
          ${ev.value} = (double) $hits / ($na + $nb - $hits);
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

object JaccardSim {
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
