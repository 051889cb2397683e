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
    VersEndpointsExpr.eval(spec.toString, excluded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.VersEndpointsExpr.eval($s.toString(), $excluded)")

  override protected def withNewChildInternal(
      newChild: Expression): VersEndpointsExpr = copy(child = newChild)
}

object VersEndpointsExpr {
  def eval(spec: String, excluded: Boolean): ArrayData = {
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
