package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the embedding-similarity hot loops.
  *
  * Why native: the higher-order-function formulation
  * (`aggregate(zip_with(a, b, ...))`) is CodegenFallback in Spark — every
  * pair evaluation walks an interpreted expression tree and allocates
  * per-element; an unrolled `element_at` chain (64 terms for a 64-dim
  * embedding) blows past the codegen method limits and ALSO falls back to
  * interpreted mode. Either way the candidate-verify join — the hottest
  * loop of LSH near-dup at scale, O(candidate pairs × dims) — runs ~20×
  * slower than a compiled loop. These expressions generate a single static
  * call into a tight primitive loop, keeping the whole stage inside
  * WholeStageCodegen.
  *
  * Both are bit-exact replacements for the HOF forms they substitute:
  * left-to-right double accumulation, float widened to double per element
  * (the order DuckDB's list_sum(list_transform(...)) oracle reproduces).
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot_native"

  private def tag(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)   => 0
    case ArrayType(DoubleType, _)  => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case t => throw new IllegalArgumentException(
      s"array_dot_native needs a numeric array, got $t")
  }

  /** Mirrors `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`:
    * null when lengths differ (zip_with pads with null → null sum) or any
    * element is null. */
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      tag(left), tag(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.expr.ArrayDotExpr.dot(
         |  $a, $b, ${tag(left)}, ${tag(right)});
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayDotExpr {
  /** Codegen helper: left-to-right double dot product. Returns null (boxed)
    * when lengths differ or an element is null — the HOF semantics.
    * Type tags: 0=float, 1=double, 2=long, 3=int. */
  def dot(a: ArrayData, b: ArrayData, aTag: Int, bTag: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = aTag match {
        case 0 => a.getFloat(i).toDouble
        case 1 => a.getDouble(i)
        case 2 => a.getLong(i).toDouble
        case _ => a.getInt(i).toDouble
      }
      val y = bTag match {
        case 0 => b.getFloat(i).toDouble
        case 1 => b.getDouble(i)
        case 2 => b.getLong(i).toDouble
        case _ => b.getInt(i).toDouble
      }
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Full sign-LSH signature over an integer-quantized vector in one compiled
  * loop: bit j of the result is 1 iff Σ_i qv_i · w(i, j) > 0 with the
  * deterministic integer plane family w(i, j) = ((i·31 + j·17) mod 7) − 3.
  *
  * Replaces `bits` separate interpreted `aggregate(zip_with(...))` plane
  * dots (each allocating a sequence + zipped array per row). The signature
  * pass runs once per corpus ROW — at 100 TB it is the dominant map-side
  * cost of sign-LSH, so it must stay compiled.
  *
  * Null handling mirrors the HOF form: a null element made every plane dot
  * null, `when(dot > 0, bit)` then took the otherwise-0 branch for every
  * plane — i.e. signature 0.
  */
case class SignLshSigExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_sig_native"

  // analysis-time validation: the helper reads with getLong, so an
  // array<int> input would read 8 bytes across 4-byte slots (garbage
  // signatures) instead of failing cleanly like the sibling expressions
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_sig_native needs array<bigint>, got $t")
    }

  override protected def nullSafeEval(qv: Any): Any =
    SignLshSigExpr.signature(qv.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      qv => s"graft.expr.SignLshSigExpr.signature($qv, $bits)")

  override protected def withNewChildInternal(
      newChild: Expression): SignLshSigExpr = copy(child = newChild)
}

object SignLshSigExpr {
  /** Codegen helper: all `bits` plane dots + sign bits in one pass. */
  def signature(qv: ArrayData, bits: Int): Long = {
    val n = qv.numElements()
    var i = 0
    while (i < n) { // null element → every plane dot null → signature 0
      if (qv.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      var s = 0L
      i = 0
      while (i < n) {
        val w = (i * 31 + j * 17) % 7 - 3
        s += qv.getLong(i) * w
        i += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Int8 scalar quantization of an embedding in one compiled pass:
  * q_i = floor(v_i · 127 / max_j |v_j|) as a 32-bit int (values in
  * [−127, 127]; an all-zero vector quantizes to all zeros).
  *
  * Why it exists: at 100 TB the ANN candidate-verify join is MEMORY-
  * bound — a 64-dim float corpus is 256 B/vector of shuffle + cache,
  * the int8 form is 64 B (4× more corpus per executor-GB; int8 is the
  * standard serving compression for embedding search). Quantization
  * runs once per corpus ROW, the same cost class as the sign-LSH
  * signature above, so it gets the same treatment: a compiled loop
  * instead of two chained interpreted HOFs (array_max(transform(abs))
  * + transform(floor)). The quantized dot then rides [[ArrayDotExpr]]'s
  * existing int path — integer-exact cross-engine, which is what lets a
  * DuckDB oracle reproduce quantized cosines bit-for-bit (the ranking
  * is integer arithmetic; only the final normalize is floating).
  *
  * Null semantics mirror the HOF form: a null ELEMENT nulls the max and
  * therefore the whole quantized array. floor + IEEE double division
  * are deterministic and identical in Spark and DuckDB, so q is
  * cross-engine exact even though it passes through doubles.
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize_native"

  private def tag: Int = child.dataType match {
    case ArrayType(FloatType, _)  => 0
    case ArrayType(DoubleType, _) => 1
    case t => throw new IllegalArgumentException(
      s"int8_quantize_native needs array<float|double>, got $t")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize_native needs array<float|double>, got $t")
    }

  override protected def nullSafeEval(v: Any): Any =
    Int8QuantizeExpr.quantize(v.asInstanceOf[ArrayData], tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.expr.Int8QuantizeExpr.quantize($v, $tag);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Int8QuantizeExpr = copy(child = newChild)
}

object Int8QuantizeExpr {
  /** Codegen helper. Type tags: 0=float, 1=double. Null on null element. */
  def quantize(v: ArrayData, tag: Int): ArrayData = {
    val n = v.numElements()
    val d = new Array[Double](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (tag == 0) v.getFloat(i).toDouble else v.getDouble(i)
      d(i) = x
      val a = math.abs(x)
      if (a > mx) mx = a
      i += 1
    }
    val q = new Array[Int](n)
    if (mx > 0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(d(i) * 127.0 / mx).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q)
  }
}
