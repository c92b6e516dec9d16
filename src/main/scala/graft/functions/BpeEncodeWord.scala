package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused BPE word encoding (r18): split a word to characters and
  * apply the whole merge table rank by rank, each rank as one
  * leftmost-first non-overlapping pass — bit-identical to
  * [[graft.ext.BpeLearn.encode]]'s composed `aggregate`-HOF fold chain
  * (the reference semantics both the training loop and the DuckDB oracle
  * implement), which paid k interpreted lambda folds per word, each
  * allocating a fresh array per symbol (`concat(acc, array(x))`) — at
  * k = 12 merges that is O(k · |word|²) boxed allocations per word and was
  * most of q142's wall. This expression runs the identical fold as a
  * compiled in-place pass: O(k · |word|) character comparisons, one output
  * array.
  *
  * Fold semantics replicated exactly: within one rank, fuse when the
  * accumulated sequence's LAST symbol equals lhs and the incoming symbol
  * equals rhs ("aaaa" + (a,a) → [aa, aa] — fuse-then-skip, the reference
  * BPE behavior); ranks apply strictly in order, rank i's output feeding
  * rank i+1. A null word yields null.
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_word"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_word needs string, got $other")
  }

  // plan-literal merge table, shared across rows (and across codegen via
  // addReferenceObj)
  @transient private lazy val table: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncodeWord.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, w =>
      s"graft.functions.BpeEncodeWord.encode($w, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeEncodeWord {

  /** The compiled fold — static so generated code can call it.
    *
    * PRECONDITION (r19, advisor find): splits the word into UTF-16 code
    * units (`charAt`), while the spec-pinned HOF twin uses
    * `split(word, "")`, which does NOT split surrogate pairs — a
    * supplementary character (outside the BMP) would tokenize differently
    * between the two. Unreachable for every current caller (words are
    * pre-filtered to `[a-z]+`), but the bit-equality contract holds only
    * for BMP input; iterate by code point before reusing on raw text. */
  def encode(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val s = word.toString
    var syms = new Array[String](s.length)
    var n = s.length
    var i = 0
    while (i < n) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
    var m = 0
    while (m < merges.length) {
      val lhs = merges(m)(0); val rhs = merges(m)(1)
      val fused = lhs + rhs
      var out = 0 // write cursor; in-place: out <= read cursor
      var r = 0
      while (r < n) {
        val cur = syms(r)
        if (out > 0 && cur == rhs && syms(out - 1) == lhs) syms(out - 1) = fused
        else { syms(out) = cur; out += 1 }
        r += 1
      }
      n = out
      m += 1
    }
    val outArr = new Array[AnyRef](n)
    i = 0
    while (i < n) { outArr(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(outArr)
  }

  def bpeEncodeWord(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), merges))
}
