package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash over a token array.
  *
  * simhash(tokens) = sign-vector of Σ(±1 per bit of xxh64(token)) packed
  * into a long. Near-identical token multisets differ in few bits, so
  * `bit_count(a ^ b)` (Hamming distance) is a near-dup measure, and bit
  * slices of the fingerprint are LSH band keys.
  *
  * Why a custom Expression and not higher-order functions: the 64-counter
  * accumulator per row would need an `aggregate` over a 64-slot struct —
  * allocating arrays per token per row. This expression keeps one stack
  * counter array per row and one hash per token, O(tokens) with zero
  * allocation beyond the counters. Used by the q39 near-dup query.
  * (SURVEY §2.9: reference needs no custom expressions; this is north-star
  * capability, done the preferred way — Expression over UDF.)
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[org.apache.spark.unsafe.types.UTF8String].getName
      val counts = ctx.freshName("counts"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val tok = ctx.freshName("tok"); val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $counts = new int[64];
        int $n = $arr.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            $utf8 $tok = $arr.getUTF8String($i);
            long $h = $xxh.hashUnsafeBytes($tok.getBaseObject(), $tok.getBaseOffset(), $tok.numBytes(), ${Seed}L);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API: `simhash64(tokensCol)`. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
