package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the trained-quality-classifier hot
  * loop ([[graft.operators.Corpus.scoreQuality]] /
  * `trainQualityClassifier`).
  *
  * Why native: the classifier's per-row work was two chained
  * higher-order functions — `transform(uni+bigrams, t => md5-bucket)`
  * then `aggregate(buckets, 0, (acc, b) => acc + w[b])` over exact
  * decimals — and HOFs are CodegenFallback in Spark: every n-gram walks
  * an interpreted expression tree and allocates a joined string + hex
  * string + conv() parse per token, and the decimal fold boxes a fresh
  * Decimal per step. Scoring runs once per corpus ROW (map-only by
  * contract — QualityClassifierSpec pins the shuffle-free plan), so at
  * scale this is the dominant map-side cost of the quality gate; the
  * round-19 bench measured x_incremental_quality_classifier as the
  * worst-scaling row in the suite (interpreted-eval allocation at 32
  * threads). These expressions run the same arithmetic as one compiled
  * loop per row inside WholeStageCodegen.
  *
  * Both are bit-exact replacements, re-gated by the DuckDB oracles
  * (x_quality_classifier / x_incremental_quality_classifier re-derive
  * the full training trajectory + scores in exact decimal) and by
  * QualityClassifierSpec:
  *   - bucket = CAST(conv(substr(md5(ngram), 1, 13), 16, 10) AS
  *     BIGINT) % dims — computed here as the first 52 bits of the md5
  *     digest (13 hex chars ≡ 6.5 big-endian bytes), identical by
  *     definition, minus the hex-string round-trip;
  *   - n-gram stream = unigrams in token order, then bigrams joined
  *     with a single space under concat_ws semantics (null tokens
  *     SKIPPED in the join; a null unigram keeps its null bucket —
  *     md5(null) is null in the HOF form);
  *   - z = fold of (acc + w[b]) with a decimal(20,12) cast after every
  *     add, plus the bias w[dims] — scale-12 unscaled longs added
  *     exactly; overflow (unreachable for learning-rate-bounded
  *     weights) falls back to java.math.BigDecimal, which equals the
  *     fold's cast semantics for any value that fits (20,12);
  *   - a null bucket element nulls the whole z (the interpreted fold's
  *     null propagation).
  * The operator's `coalesce(toks, array())` null-array handling stays
  * in the operator, so these expressions keep Spark's standard
  * null-in/null-out contract.
  */
case class QcBucketsExpr(child: Expression, dims: Int)
    extends UnaryExpression {
  require(dims >= 1, "qc_buckets_native needs dims >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "qc_buckets_native"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qc_buckets_native needs array<string>, got $t")
    }

  override protected def nullSafeEval(toks: Any): Any =
    QcBucketsExpr.buckets(toks.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      toks => s"graft.expr.QcBucketsExpr.buckets($toks, $dims)")

  override protected def withNewChildInternal(
      newChild: Expression): QcBucketsExpr = copy(child = newChild)
}

object QcBucketsExpr {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val SEP = UTF8String.fromString(" ")

  /** First 52 bits of md5(t) (≡ CAST(conv(substr(md5_hex, 1, 13), 16,
    * 10) AS BIGINT) — 13 hex chars are digest bytes 0..5 plus the high
    * nibble of byte 6), mod dims. */
  private def bucket(md: MessageDigest, t: UTF8String, dims: Int): Long = {
    md.reset()
    val d = md.digest(t.getBytes)
    val v = ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) |
      ((d(2) & 0xffL) << 28) | ((d(3) & 0xffL) << 20) |
      ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
      ((d(6) & 0xffL) >>> 4)
    v % dims
  }

  /** Codegen helper: hashed uni+bigram buckets — unigrams in token
    * order, then bigrams (single-space concat_ws join, nulls
    * skipped). A null token yields a null unigram bucket. */
  def buckets(toks: ArrayData, dims: Int): ArrayData = {
    val n = toks.numElements()
    val md = md5Local.get()
    val nBi = math.max(n - 1, 0)
    val out = new Array[Any](n + nBi)
    var i = 0
    while (i < n) {
      out(i) =
        if (toks.isNullAt(i)) null
        else java.lang.Long.valueOf(
          bucket(md, toks.getUTF8String(i), dims))
      i += 1
    }
    i = 0
    while (i < nBi) {
      // concat_ws(" ", a, b): null elements are skipped, both-null
      // joins to the empty string
      val aNull = toks.isNullAt(i)
      val bNull = toks.isNullAt(i + 1)
      val joined =
        if (aNull && bNull) UTF8String.EMPTY_UTF8
        else if (aNull) toks.getUTF8String(i + 1)
        else if (bNull) toks.getUTF8String(i)
        else UTF8String.concat(toks.getUTF8String(i), SEP,
          toks.getUTF8String(i + 1))
      out(n + i) = java.lang.Long.valueOf(bucket(md, joined, dims))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** z = Σ_b w[bucket b] + w[dims] (bias) over a FOLDABLE dims+1 weight
  * literal, exact decimal(20,12) — the compiled form of the
  * `aggregate(bk, 0, (acc, b) => (acc + element_at(wArr, b + 1))
  * .cast(decimal(20,12))) + bias` fold. See [[QcBucketsExpr]] for the
  * why and the equivalence argument. */
case class QcZExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(20, 12)
  override def nullable: Boolean = true
  override def prettyName: String = "qc_z_native"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(_: DecimalType, _))
          if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "qc_z_native needs (array<bigint>, foldable array<decimal>), " +
            s"got ($l, $r${if (right.foldable) "" else " non-foldable"})")
    }

  /** The weight vector, evaluated once from the foldable literal and
    * pinned as scale-12 unscaled longs (exact: the trainer emits
    * setScale(12) values; longValueExact loudly rejects anything that
    * would not round-trip). */
  @transient private lazy val scaled: Array[Long] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val elemType = right.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "qc_z_native weights must be non-null")
      out(i) = arr.get(i, elemType).asInstanceOf[Decimal]
        .toJavaBigDecimal.setScale(12).movePointRight(12).longValueExact()
      i += 1
    }
    out
  }

  override protected def nullSafeEval(bk: Any, w: Any): Any =
    QcZExpr.z(bk.asInstanceOf[ArrayData], scaled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qcWeights", scaled, "long[]")
    nullSafeCodeGen(ctx, ev, (bk, _) => {
      s"""
         |org.apache.spark.sql.types.Decimal ${ev.value}_r =
         |  graft.expr.QcZExpr.z($bk, $wRef);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QcZExpr =
    copy(left = newLeft, right = newRight)
}

object QcZExpr {
  /** Codegen helper: exact scale-12 fold + bias. Null bucket element →
    * null z (the interpreted fold's null propagation). */
  def z(bk: ArrayData, w: Array[Long]): Decimal = {
    val n = bk.numElements()
    var s = 0L
    var i = 0
    try {
      while (i < n) {
        if (bk.isNullAt(i)) return null
        s = Math.addExact(s, w(bk.getLong(i).toInt))
        i += 1
      }
      s = Math.addExact(s, w(w.length - 1))
      Decimal(java.math.BigDecimal.valueOf(s, 12), 20, 12)
    } catch {
      case _: ArithmeticException =>
        var b = java.math.BigDecimal.ZERO
        i = 0
        while (i < n) {
          if (bk.isNullAt(i)) return null
          b = b.add(java.math.BigDecimal.valueOf(w(bk.getLong(i).toInt), 12))
          i += 1
        }
        b = b.add(java.math.BigDecimal.valueOf(w(w.length - 1), 12))
        Decimal(b, 20, 12)
    }
  }
}
