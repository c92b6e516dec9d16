package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash signature: w-shingle the token array and compute k
  * seeded-xxh64 minima in ONE pass.
  *
  * The composable formulation (`shingles → k × array_min(transform(...))`)
  * is interpreted (higher-order functions are CodegenFallback) and
  * materializes the shingle array once per referencing lambda unless
  * carefully staged — this expression walks the token array once, builds
  * each shingle's bytes once, and folds all k minima as it goes:
  * O(shingles × k) longs, zero intermediate arrays.
  */
case class MinHashSig(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val nShingles = math.max(1, n - (w - 1))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      val end = math.min(i + w, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        if (!toks.isNullAt(j)) sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      val s = UTF8String.fromString(sb.toString)
      var seed = 0
      while (seed < k) {
        // seed folded into the hash the same way xxhash64(lit(seed), s)
        // chains: hash the seed's long, then the bytes with that as seed
        val h0 = XXH64.hashLong(seed.toLong, 42L)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h0)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val seeds = ctx.freshName("seeds"); val nSh = ctx.freshName("nSh")
      val sb = ctx.freshName("sb"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val s = ctx.freshName("s"); val seed = ctx.freshName("seed")
      val h = ctx.freshName("h")
      s"""
        int $n = $toks.numElements();
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        long[] $seeds = new long[$k];
        for (int $seed = 0; $seed < $k; $seed++) {
          $seeds[$seed] = $xxh.hashLong((long) $seed, 42L);
        }
        int $nSh = java.lang.Math.max(1, $n - ${w - 1});
        java.lang.StringBuilder $sb = new java.lang.StringBuilder(64);
        for (int $i = 0; $i < $nSh; $i++) {
          $sb.setLength(0);
          int $end = java.lang.Math.min($i + $w, $n);
          for (int $j = $i; $j < $end; $j++) {
            if ($j > $i) $sb.append(' ');
            if (!$toks.isNullAt($j)) $sb.append($toks.getUTF8String($j).toString());
          }
          $utf8 $s = $utf8.fromString($sb.toString());
          for (int $seed = 0; $seed < $k; $seed++) {
            long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $seeds[$seed]);
            if ($h < $mins[$seed]) $mins[$seed] = $h;
          }
        }
        ${ev.value} = new $gad($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(tokens: Column, k: Int, w: Int = 3): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k, w))
}
