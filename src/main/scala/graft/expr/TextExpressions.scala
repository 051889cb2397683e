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

/** Stride-1 L-token window digests in ONE O(tokens) pass — the rolling
  * hash the substring-dedup family's scaladoc promised for production
  * (the first cut materialized each window as a concat_ws string and
  * hashed it: O(tokens × L) characters built and hashed; at 100× that
  * string build dominated the whole operator).
  *
  * Per token one xxhash64 (Spark's own XXH64 over the UTF8 bytes, two
  * seeds); per window two polynomial combinations updated in O(1):
  *  - h1 = Σ A^(L-1-j)·x₁[i+j] in the 2^64 ring (odd A, natural
  *    overflow);
  *  - h2 = Σ B^(L-1-j)·x₂[i+j] mod p, p = 2^61−1 (Mersenne; mulmod via
  *    Math.multiplyHigh and 2^64 ≡ 8 (mod p)).
  * Collision model: ~125 combined bits across two DIFFERENT rings under
  * ideal token hashes — expected colliding window pairs ≈ N²/2^126,
  * ~2^-44 at N = 2^41 (the chunkDigest budget). The 2^64 ring alone has
  * known structure (low-bit weakness of power-of-two moduli); the
  * Mersenne ring does not share it — the same cross-family argument as
  * chunkDigest. Non-cryptographic: adversarial inputs can beat the
  * model; injectivity is hash-gated end-to-end at test scale by the
  * string-derived oracles (x_substring_dedup / x_substring_strip
  * recompute from raw window strings in DuckDB).
  *
  * Input: array<string> tokens; returns array<struct<pos:int, h1:long,
  * h2:long>> — one entry per window start, empty when
  * size(tokens) < L. A null ELEMENT hashes as the empty string (the
  * committed call sites never produce one — tokens() yields non-null —
  * but the function is registered for direct SQL use, where the
  * concat_ws formulation it replaced also null-tolerated). */
case class RollingWindowDigestsExpr(child: Expression, windowTokens: Int)
    extends UnaryExpression {
  require(windowTokens >= 1, s"windowTokens must be >= 1: $windowTokens")

  override def dataType: DataType = RollingWindowDigestsExpr.schema
  override def prettyName: String = "rolling_window_digests_native"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_window_digests_native needs array<string>, got $t")
    }

  override protected def nullSafeEval(toks: Any): Any =
    RollingWindowDigestsExpr.evalTokens(
      toks.asInstanceOf[ArrayData], windowTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.RollingWindowDigestsExpr.evalTokens($c, $windowTokens)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingWindowDigestsExpr = copy(child = newChild)
}

object RollingWindowDigestsExpr {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("pos", org.apache.spark.sql.types.IntegerType,
      nullable = false),
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  private final val A = 0x9E3779B97F4A7C15L | 1L // odd: unit in Z/2^64
  private final val P = (1L << 61) - 1           // Mersenne prime
  private final val B = 0x2545F4914F6CDD1DL % P

  /** (a*b) mod 2^61−1 for 0 <= a,b < p: 128-bit product via
    * multiplyHigh, folded with 2^64 ≡ 8 (mod p). */
  private def mulmodP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^58 for a,b < 2^61
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    while (r >= P) r -= P
    r
  }

  /** evalTokens, not eval — see VersEndpointsExpr's static-forwarder
    * note (a companion `eval` clashes with Expression.eval and drops
    * the stage to interpreter mode). */
  def evalTokens(toks: ArrayData, l: Int): ArrayData = {
    val n = toks.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val x1 = new Array[Long](n)
    val x2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val raw = toks.getUTF8String(i)
      // null element hashes as "" (see class scaladoc)
      val s = if (raw == null) UTF8String.EMPTY_UTF8 else raw
      x1(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      x2(i) = java.lang.Long.remainderUnsigned(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28cL), P)
      i += 1
    }
    // A^L in the 2^64 ring; B^L mod p
    var aL = 1L
    var bL = 1L
    i = 0
    while (i < l) { aL *= A; bL = mulmodP(bL, B); i += 1 }
    // initial window [0, l)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < l) {
      h1 = h1 * A + x1(i)
      h2 = (mulmodP(h2, B) + x2(i)) % P
      i += 1
    }
    val out = new Array[Any](n - l + 1)
    var pos = 0
    while (true) {
      out(pos) = new GenericInternalRow(Array[Any](pos, h1, h2))
      if (pos + l >= n) return new GenericArrayData(out)
      // slide: drop x[pos], admit x[pos+l]
      h1 = h1 * A - aL * x1(pos) + x1(pos + l)
      val drop = mulmodP(bL, x2(pos))
      h2 = (mulmodP(h2, B) + P - drop) % P
      h2 = (h2 + x2(pos + l)) % P
      h2 = ((h2 % P) + P) % P
      pos += 1
    }
    new GenericArrayData(out) // unreachable
  }
}
