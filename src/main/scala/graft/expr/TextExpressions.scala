package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document top word-n-gram in ONE compiled pass — the Gopher-style
  * repetition signal without any shuffle.
  *
  * Why native: a document's most-frequent n-gram is a function of that
  * document alone, so the explode → groupBy(doc, gram) → per-doc top-1
  * formulation pays two hash-aggregate exchanges and serializes every
  * n-gram occurrence of the corpus through a shuffle — at 100 TB that is
  * shuffling roughly the corpus's own token volume to compute a per-ROW
  * statistic. This expression counts n-grams in a per-row hash map and
  * emits the winner, turning the whole query into a map-only scan that
  * stays inside WholeStageCodegen. (Contrast with corpus-LEVEL statistics
  * like vocabulary top-k, which genuinely need the aggregation exchange.)
  *
  * Semantics are pinned to the aggregation formulation it replaces (and
  * to the DuckDB oracle): grams are tokens joined by a single space,
  * count ties break to the binary-smallest gram (UTF8String ordering —
  * the same ordering `min_by` used), `total_chars` is the sum of token
  * CHARACTER counts (not bytes), and a doc with fewer than n tokens (or
  * a null token array) yields null. Returns
  * struct(gram, cnt, total_chars).
  */
case class TopNgramExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "n-gram repetition needs n >= 2")

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "top_ngram_native"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_ngram_native needs array<string>, got $t")
    }

  override protected def nullSafeEval(toks: Any): Any =
    TopNgramExpr.top(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |InternalRow ${ev.value}_r = graft.expr.TopNgramExpr.top($toks, $n);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopNgramExpr =
    copy(child = newChild)
}

object TopNgramExpr {
  private val SEP = UTF8String.fromString(" ")

  /** Codegen helper: count every n-gram of `toks` in a local map, return
    * struct(winning gram, its count, total token chars) — or null when
    * no n-gram exists (fewer than n tokens) or a token is null (the
    * aggregate-formulation's null-propagation). */
  def top(toks: ArrayData, n: Int): InternalRow = {
    val sz = toks.numElements()
    val arr = new Array[UTF8String](sz)
    var total = 0L
    var i = 0
    while (i < sz) {
      if (toks.isNullAt(i)) return null
      val t = toks.getUTF8String(i)
      arr(i) = t
      total += t.numChars()
      i += 1
    }
    if (sz < n) return null
    // one map per ROW, bounded by the doc's own n-gram vocabulary — this
    // is the memory the groupBy hash-aggregate would have spent anyway,
    // minus the exchange
    val counts = new java.util.HashMap[UTF8String, Array[Long]](
      math.min(sz * 2, 1 << 16))
    i = 0
    while (i <= sz - n) {
      val gram =
        if (n == 2) UTF8String.concat(arr(i), SEP, arr(i + 1))
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = arr(i + j)
            if (j < n - 1) parts(2 * j + 1) = SEP
            j += 1
          }
          UTF8String.concat(parts: _*)
        }
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1L)) else c(0) += 1
      i += 1
    }
    var bestGram: UTF8String = null
    var bestCnt = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestCnt ||
        (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](bestGram, bestCnt, total))
  }
}
