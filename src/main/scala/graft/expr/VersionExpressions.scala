package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Vers, VersionOrd}

/** Native Catalyst expressions for the version domain (SURVEY §2.11 #1-2).
  *
  * Why native instead of the Scala UDFs in GraftFunctions:
  *  - codegen keeps the call inside WholeStageCodegen (no UDF
  *    serialization / InternalRow conversion per row);
  *  - `VersionInRangeExpr` pre-parses a FOLDABLE range spec once per
  *    operator instance instead of per row — on a 100 TB scan of the
  *    unfurl join that parse is the dominant per-row cost of the UDF form.
  */
case class VersionSortKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // left = scheme, right = version
  override def dataType: DataType = StringType
  override def prettyName: String = "version_sort_key_native"

  override protected def nullSafeEval(scheme: Any, version: Any): Any =
    UTF8String.fromString(VersionOrd.sortKey(scheme.toString, version.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.VersionOrd.sortKey($s.toString(), $v.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VersionSortKeyExpr =
    copy(left = newLeft, right = newRight)
}

case class VersionInRangeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // left = version, right = vers spec
  override def dataType: DataType = BooleanType
  override def prettyName: String = "version_in_range_native"

  /** Range parsed once when the spec is a literal (the common case:
    * constant ranges from advisory rows joined as literals, or per-task
    * after Catalyst constant-folds the spec column). */
  @transient private lazy val constRange: Option[Vers.Range] = right match {
    case Literal(s, StringType) if s != null =>
      try Some(Vers.parse(s.toString)) catch { case _: Exception => None }
    case _ => None
  }

  override protected def nullSafeEval(version: Any, spec: Any): Any =
    constRange match {
      case Some(r) => Vers.contains(r, version.toString)
      case None =>
        try Vers.versionInRange(version.toString, spec.toString)
        catch { case _: Exception => false }
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    constRange match {
      case Some(r) =>
        val ref = ctx.addReferenceObj("versRange", r, classOf[Vers.Range].getName)
        defineCodeGen(ctx, ev, (v, _) =>
          s"graft.functions.Vers.contains($ref, $v.toString())")
      case None =>
        defineCodeGen(ctx, ev, (v, s) =>
          s"graft.expr.VersionInRangeExpr.safeContains($v.toString(), $s.toString())")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VersionInRangeExpr =
    copy(left = newLeft, right = newRight)
}

object VersionInRangeExpr {
  /** Codegen helper for the non-constant-spec path. */
  def safeContains(version: String, spec: String): Boolean =
    try Vers.versionInRange(version, spec) catch { case _: Exception => false }
}

/** Scheme-aware canonical version rendering (univers `str(version)`;
  * VersionOrd.render — apache 4-segment `+build` is the one non-identity
  * family). Native so the improver family's inference assembly stays
  * inside WholeStageCodegen. */
case class VersionRenderExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // left = scheme, right = version
  override def dataType: DataType = StringType
  override def prettyName: String = "version_render_native"

  override protected def nullSafeEval(scheme: Any, version: Any): Any =
    UTF8String.fromString(VersionOrd.render(scheme.toString, version.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.VersionOrd.render($s.toString(), $v.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VersionRenderExpr =
    copy(left = newLeft, right = newRight)
}

/** Constraint-endpoint extraction from a `vers:` spec, native array
  * output (DefaultImprover's get_exact_purls algebra — improvers/
  * default.py:88-141): `excluded = false` → resolved endpoints that
  * satisfy their own range; `excluded = true` → `!=` exclusions.
  * Malformed specs yield an empty array (the error-channel convention
  * of the UDF twins in GraftFunctions). */
case class VersEndpointsExpr(child: Expression, excluded: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (excluded) "vers_excluded_native" else "vers_endpoints_native"

  override protected def nullSafeEval(spec: Any): Any =
    VersEndpointsExpr.evalSpec(spec.toString, excluded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.VersEndpointsExpr.evalSpec($s.toString(), $excluded)")

  override protected def withNewChildInternal(
      newChild: Expression): VersEndpointsExpr = copy(child = newChild)
}

object VersEndpointsExpr {
  /** Named evalSpec, NOT eval: a companion method sharing its name with
    * Expression.eval gets no static forwarder on the class, so janino
    * resolved the generated call against the instance method and the
    * whole stage fell back to interpreter mode (a silent per-row cost
    * found in round 14 via the Predicate codegen WARN). */
  def evalSpec(spec: String, excluded: Boolean): ArrayData = {
    val vs =
      if (spec.trim.isEmpty) Seq.empty[String]
      else
        try {
          if (excluded) Vers.exactVersions(spec)._2
          else Vers.resolvedConstraintVersions(spec)
        } catch { case _: Exception => Seq.empty[String] }
    new GenericArrayData(vs.map(UTF8String.fromString))
  }
}

/** Pure-interval bound extraction from a `vers:` spec — the
  * data-column analog of [[ConstantVersionRangeRewrite]]'s purity test,
  * evaluated per ROW so non-constant range columns (d17's
  * `affecting_vers`) can take a sort-key bound fast path.
  *
  * Returns struct(lo_key, hi_key, hi_incl, pure):
  *  - `pure = true` iff the spec is a single closed-form interval the
  *    key algebra reproduces EXACTLY: ops drawn from one optional `>=`
  *    and one optional `<`/`<=` (at least one present, and
  *    lo_key < hi_key strictly when both), or a single `=` pin
  *    (lo_key = hi_key, inclusive). `Vers.contains` compares the same
  *    sort keys, so on pure specs
  *    `in_range ⇔ (lo_key ≤ key) ∧ (key <(=) hi_key)` by construction.
  *  - anything else — exclusions, `>`, `*`, multi-interval,
  *    inverted/degenerate bounds, parse failures — yields
  *    `pure = false` and the caller falls back to the full interval
  *    walk.
  * Keys are scheme-aware ([[VersionOrd.sortKey]] on the spec's own
  * scheme), matching the `_vkey` the caller computes on the version
  * column with the same scheme. */
case class VersPureBoundsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VersPureBoundsExpr.schema
  override def prettyName: String = "vers_pure_bounds_native"

  override protected def nullSafeEval(spec: Any): Any =
    VersPureBoundsExpr.evalSpec(spec.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.VersPureBoundsExpr.evalSpec($s.toString())")

  override protected def withNewChildInternal(
      newChild: Expression): VersPureBoundsExpr = copy(child = newChild)
}

object VersPureBoundsExpr {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("lo_key", StringType, nullable = true),
    StructField("hi_key", StringType, nullable = true),
    StructField("hi_incl", BooleanType, nullable = false),
    StructField("pure", BooleanType, nullable = false)))

  private val notPure: InternalRow =
    new GenericInternalRow(Array[Any](null, null, false, false))

  /** evalSpec, not eval — see [[VersEndpointsExpr.evalSpec]]'s
    * static-forwarder note. */
  def evalSpec(spec: String): InternalRow = {
    val r =
      try Vers.parseCached(spec)
      catch { case _: Exception => return notPure }
    val cs = r.constraints
    val ops = cs.map(_.op)
    def key(v: String) = VersionOrd.sortKey(r.scheme, v)
    if (ops == Seq("=")) {
      // a `=` pin folds to [key, key] ONLY where key equality IS version
      // equality; apache's build-metadata-inclusive `=` (eqKey finer
      // than sortKey) must take the interval-walk path instead
      if (VersionOrd.eqSensitive(r.scheme)) return notPure
      val k = UTF8String.fromString(key(cs.head.version))
      return new GenericInternalRow(Array[Any](k, k, true, true))
    }
    val pureOps = ops.nonEmpty &&
      ops.forall(o => o == ">=" || o == "<" || o == "<=") &&
      ops.count(_ == ">=") <= 1 &&
      ops.count(o => o == "<" || o == "<=") <= 1
    if (!pureOps) return notPure
    val lo = cs.find(_.op == ">=").map(c => key(c.version))
    val hiC = cs.find(c => c.op == "<" || c.op == "<=")
    val hi = hiC.map(c => key(c.version))
    val ordered = (lo, hi) match {
      case (Some(l), Some(h)) => l < h
      case _ => true
    }
    if (!ordered) notPure
    else new GenericInternalRow(Array[Any](
      lo.map(UTF8String.fromString).orNull,
      hi.map(UTF8String.fromString).orNull,
      hiC.exists(_.op == "<="), true))
  }
}
