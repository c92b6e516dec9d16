package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused nearest-candidate selection (r18): for one row's vector, scan a
  * (broadcast, bounded-by-contract) candidate array ONCE and return the
  * winning candidate's key and score as `struct(key: long, score: double)`.
  *
  * Replaces the catalog's standard three-stage assignment shape —
  * `corpus.crossJoin(broadcast(cands))` (materializing n·|cands| narrow
  * rows) → per-id [[ArgExtremum]] HashAggregate over that cross product →
  * re-attach join of the payload by key — with one expression evaluated
  * inside the corpus scan's WholeStageCodegen span: no n·|cands| row
  * materialization, no aggregation hash table over it, no re-attach join
  * (payload columns simply flow through the projection). At sf0.1 the
  * nearest-centroid assignment (60k vectors × 600 centroids) was the
  * dominant stage of every query in the knn/semantic-dedup family.
  *
  * BIT-EQUALITY CONTRACT (spec-pinned in NearestKeySpec):
  *  - `metric = "cosine"` maximizes [[CosineSimilarity]]'s exact value
  *    (same per-element double cast, same fused left-to-right loop);
  *    `metric = "sqdist"` minimizes [[SqL2Distance]]'s ‖a‖² − 2a·b + ‖b‖².
  *  - Selection follows [[ArgExtremum]] exactly: strict improvement wins,
  *    score ties keep the SMALLEST key, NaN scores and null keys/vectors
  *    are skipped, no valid candidate ⇒ null result. The candidate array
  *    may be in any order (the tie rule makes the result order-free);
  *    callers build it with `sort_array(collect_list(struct(key, cvec)))`
  *    so iteration order is key-ascending anyway.
  *
  * Same non-null-element, equal-length preconditions as the metric
  * expressions it fuses. The candidate array is data by contract the
  * callers already enforce (it is the table they used to broadcast).
  */
case class NearestKey(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  require(metric == "cosine" || metric == "sqdist",
    s"metric must be cosine|sqdist, got $metric")

  private def maximize: Boolean = metric == "cosine"

  // ALWAYS nullable (r19, advisor find): the expression evaluates to null
  // on NON-NULL inputs too — all scores NaN (zero-norm vector under
  // cosine) or an empty candidate array. BinaryExpression's default
  // (left.nullable || right.nullable) would declare non-nullable for
  // non-nullable inputs, making nullSafeCodeGen emit an assignment to a
  // false-literal isNull (codegen compile error → interpreted fallback)
  // and licensing null-unsound optimizer rewrites. ArgExtremum overrides
  // nullable for exactly this reason.
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_key"

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (v, ArrayType(StructType(Array(kf, cf)), _))
        if vecOk(v) && kf.dataType == LongType && vecOk(cf.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_key needs (array<float|double>, array<struct<long, array<float|double>>>), got ($l, $r)")
  }

  private lazy val vecIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val candIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vec = l.asInstanceOf[ArrayData]
    val cands = r.asInstanceOf[ArrayData]
    val nv = vec.numElements()
    var seen = false
    var best = if (maximize) Double.NegativeInfinity else Double.PositiveInfinity
    var bestK = Long.MaxValue
    var c = 0
    val m = cands.numElements()
    while (c < m) {
      if (!cands.isNullAt(c)) {
        val st = cands.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val k = st.getLong(0)
          val cv = st.getArray(1)
          val nc = cv.numElements()
          val n = math.min(nv, nc)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < n) {
            val x = elem(vec, vecIsFloat, i); val y = elem(cv, candIsFloat, i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          var j = n
          while (j < nv) { val x = elem(vec, vecIsFloat, j); na += x * x; j += 1 }
          j = n
          while (j < nc) { val y = elem(cv, candIsFloat, j); nb += y * y; j += 1 }
          val score =
            if (maximize) dot / (math.sqrt(na) * math.sqrt(nb))
            else na - 2.0 * dot + nb
          if (!java.lang.Double.isNaN(score)) {
            val beats = !seen ||
              (if (maximize) score > best else score < best) ||
              (score == best && k < bestK)
            if (beats) { best = score; bestK = k }
            seen = true
          }
        }
      }
      c += 1
    }
    if (seen) new GenericInternalRow(Array[Any](bestK, best)) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (vec, cands) => {
      val vGet = if (vecIsFloat) s"(double) $vec.getFloat" else s"$vec.getDouble"
      val row = classOf[InternalRow].getName
      val gir = classOf[GenericInternalRow].getName
      val ad = classOf[ArrayData].getName
      val nv = ctx.freshName("nv"); val m = ctx.freshName("m")
      val seen = ctx.freshName("seen"); val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK"); val c = ctx.freshName("c")
      val st = ctx.freshName("st"); val k = ctx.freshName("k")
      val cv = ctx.freshName("cv"); val nc = ctx.freshName("nc")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val score = ctx.freshName("score")
      val beats = ctx.freshName("beats")
      val cGet = if (candIsFloat) s"(double) $cv.getFloat" else s"$cv.getDouble"
      val init = if (maximize) "Double.NEGATIVE_INFINITY" else "Double.POSITIVE_INFINITY"
      val cmp = if (maximize) s"$score > $best" else s"$score < $best"
      val scoreExpr = if (maximize)
        s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
      else s"$na - 2.0 * $dot + $nb"
      s"""
        int $nv = $vec.numElements();
        int $m = $cands.numElements();
        boolean $seen = false;
        double $best = $init;
        long $bestK = Long.MAX_VALUE;
        for (int $c = 0; $c < $m; $c++) {
          if ($cands.isNullAt($c)) continue;
          $row $st = $cands.getStruct($c, 2);
          if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
          long $k = $st.getLong(0);
          $ad $cv = $st.getArray(1);
          int $nc = $cv.numElements();
          int $n = java.lang.Math.min($nv, $nc);
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          int $i = 0;
          while ($i < $n) {
            double $x = $vGet($i); double $y = $cGet($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
            $i++;
          }
          for ($i = $n; $i < $nv; $i++) { double $x = $vGet($i); $na += $x * $x; }
          for ($i = $n; $i < $nc; $i++) { double $y = $cGet($i); $nb += $y * $y; }
          double $score = $scoreExpr;
          if (Double.isNaN($score)) continue;
          boolean $beats = !$seen || ($cmp) || ($score == $best && $k < $bestK);
          if ($beats) { $best = $score; $bestK = $k; }
          $seen = true;
        }
        if ($seen) {
          ${ev.value} = new $gir(new Object[]{$bestK, $best});
        } else {
          ${ev.isNull} = true;
        }
      """
    })
    res
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestKey =
    copy(left = l, right = r)
}

object NearestKey {
  /** `struct(key, score)` of the cosine-argmax candidate (ties → smallest
    * key; null when no valid candidate). */
  def nearestByCosine(vec: Column, cands: Column): Column =
    ColumnBridge.column(NearestKey(
      ColumnBridge.expression(vec), ColumnBridge.expression(cands), "cosine"))

  /** `struct(key, score)` of the squared-L2-argmin candidate. */
  def nearestBySqDist(vec: Column, cands: Column): Column =
    ColumnBridge.column(NearestKey(
      ColumnBridge.expression(vec), ColumnBridge.expression(cands), "sqdist"))
}
