package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Vers, VersionOrd}

/** Engine extensions: native function registration + the optional
  * optimizer rule from SURVEY §4 — rewrite `version_in_range(v, <const
  * simple interval>)` into two sort-key string comparisons, turning the
  * domain predicate into plain codegen'd string bounds.
  *
  * Activate with spark.sql.extensions=graft.expr.GraftExtensions
  * (set by graft.core.Sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** SQL-surface arity check: without it, `args(1)` on a 1-arg call
    * surfaces as an IndexOutOfBoundsException deep in the builder and
    * extra args are silently dropped. Match Spark's builtin behavior of
    * failing the call cleanly with the expected arity spelled out. */
  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: expected $n, " +
          s"found ${args.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("version_sort_key_native"),
      new ExpressionInfo(classOf[VersionSortKeyExpr].getName,
        "version_sort_key_native"),
      (args: Seq[Expression]) => {
        arity("version_sort_key_native", 2, args)
        VersionSortKeyExpr(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("version_in_range_native"),
      new ExpressionInfo(classOf[VersionInRangeExpr].getName,
        "version_in_range_native"),
      (args: Seq[Expression]) => {
        arity("version_in_range_native", 2, args)
        VersionInRangeExpr(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("version_render_native"),
      new ExpressionInfo(classOf[VersionRenderExpr].getName,
        "version_render_native"),
      (args: Seq[Expression]) => {
        arity("version_render_native", 2, args)
        VersionRenderExpr(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("vers_endpoints_native"),
      new ExpressionInfo(classOf[VersEndpointsExpr].getName,
        "vers_endpoints_native"),
      (args: Seq[Expression]) => {
        arity("vers_endpoints_native", 1, args)
        VersEndpointsExpr(args(0), excluded = false)
      }))
    e.injectFunction((
      new FunctionIdentifier("vers_excluded_native"),
      new ExpressionInfo(classOf[VersEndpointsExpr].getName,
        "vers_excluded_native"),
      (args: Seq[Expression]) => {
        arity("vers_excluded_native", 1, args)
        VersEndpointsExpr(args(0), excluded = true)
      }))
    e.injectFunction((
      new FunctionIdentifier("vers_pure_bounds_native"),
      new ExpressionInfo(classOf[VersPureBoundsExpr].getName,
        "vers_pure_bounds_native"),
      (args: Seq[Expression]) => {
        arity("vers_pure_bounds_native", 1, args)
        VersPureBoundsExpr(args(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("array_dot_native"),
      new ExpressionInfo(classOf[ArrayDotExpr].getName, "array_dot_native"),
      (args: Seq[Expression]) => {
        arity("array_dot_native", 2, args)
        ArrayDotExpr(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("int8_quantize_native"),
      new ExpressionInfo(classOf[Int8QuantizeExpr].getName,
        "int8_quantize_native"),
      (args: Seq[Expression]) => {
        arity("int8_quantize_native", 1, args)
        Int8QuantizeExpr(args(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("sign_lsh_sig_native"),
      new ExpressionInfo(classOf[SignLshSigExpr].getName,
        "sign_lsh_sig_native"),
      (args: Seq[Expression]) => {
        arity("sign_lsh_sig_native", 2, args)
        SignLshSigExpr(args(0), args(1) match {
          case l: Literal => l.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"sign_lsh_sig_native bits must be a literal, got $other")
        })
      }))
    e.injectFunction((
      new FunctionIdentifier("top_ngram_native"),
      new ExpressionInfo(classOf[TopNgramExpr].getName, "top_ngram_native"),
      (args: Seq[Expression]) => {
        arity("top_ngram_native", 2, args)
        TopNgramExpr(args(0), args(1) match {
          case l: Literal => l.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"top_ngram_native n must be a literal, got $other")
        })
      }))
    e.injectFunction((
      new FunctionIdentifier("qc_buckets_native"),
      new ExpressionInfo(classOf[QcBucketsExpr].getName,
        "qc_buckets_native"),
      (args: Seq[Expression]) => {
        arity("qc_buckets_native", 2, args)
        QcBucketsExpr(args(0), args(1) match {
          case l: Literal => l.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"qc_buckets_native dims must be a literal, got $other")
        })
      }))
    e.injectFunction((
      new FunctionIdentifier("qc_z_native"),
      new ExpressionInfo(classOf[QcZExpr].getName, "qc_z_native"),
      (args: Seq[Expression]) => {
        arity("qc_z_native", 2, args)
        QcZExpr(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_window_digests_native"),
      new ExpressionInfo(classOf[RollingWindowDigestsExpr].getName,
        "rolling_window_digests_native"),
      (args: Seq[Expression]) => {
        arity("rolling_window_digests_native", 2, args)
        RollingWindowDigestsExpr(args(0), args(1) match {
          case l: Literal => l.value.asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"rolling_window_digests_native window must be a literal, got $other")
        })
      }))
    e.injectOptimizerRule(_ => ConstantVersionRangeRewrite)
    e.injectOptimizerRule(_ => MaterializedVersionKeyRewrite)
  }
}

/** Rewrite rule: a constant `vers:` spec that is a single pure interval
  * ([>=lo], [<hi], or both, no pins/exclusions) becomes sort-key bounds:
  *   version_in_range(v, 'vers:s/>=a|<b')
  *     → sort_key(s, v) >= key(a) AND sort_key(s, v) < key(b)
  * Semantics are identical by construction (Vers.contains compares the
  * same keys); the win is two string comparisons instead of an interval
  * walk, and a shape Catalyst can fold/reorder freely. */
object ConstantVersionRangeRewrite extends Rule[LogicalPlan] {

  private def keyLit(scheme: String, v: String): Expression =
    Literal(UTF8String.fromString(VersionOrd.sortKey(scheme, v)), StringType)

  private def rewrite(expr: Expression): Expression = expr.transformUp {
    case vir @ VersionInRangeExpr(version, Literal(spec, StringType))
        if spec != null =>
      val parsed =
        try Some(Vers.parse(spec.toString)) catch { case _: Exception => None }
      parsed match {
        case Some(r) =>
          val ops = r.constraints.map(_.op)
          val pure = ops.nonEmpty && ops.forall(o => o == ">=" || o == "<") &&
            ops.count(_ == ">=") <= 1 && ops.count(_ == "<") <= 1
          // both-bounds specs are a single interval ONLY when the >=
          // bound sorts BELOW the < bound; in the inverted spelling
          // (">=2.0|<1.0") the vers interval walk over SORTED
          // constraints means v<1.0 OR v>=2.0 — a disjunction the AND
          // rewrite would turn into an always-false predicate. Skip
          // the rewrite there; the interval walk stays correct.
          val loV = r.constraints.find(_.op == ">=").map(_.version)
          val hiV = r.constraints.find(_.op == "<").map(_.version)
          val ordered = (loV, hiV) match {
            case (Some(lo), Some(hi)) =>
              VersionOrd.sortKey(r.scheme, lo) < VersionOrd.sortKey(r.scheme, hi)
            case _ => true
          }
          if (!pure || !ordered) vir
          else {
            val schemeLit = Literal(UTF8String.fromString(r.scheme), StringType)
            val key = VersionSortKeyExpr(schemeLit, version)
            val lower = r.constraints.find(_.op == ">=")
              .map(c => GreaterThanOrEqual(key, keyLit(r.scheme, c.version)))
            val upper = r.constraints.find(_.op == "<")
              .map(c => LessThan(key, keyLit(r.scheme, c.version)))
            (lower, upper) match {
              case (Some(l), Some(u)) => And(l, u)
              case (Some(l), None)    => l
              case (None, Some(u))    => u
              case _                  => vir
            }
          }
        case None => vir
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter => f.copy(condition = rewrite(f.condition))
  }
}

/** Substitute sort-key COMPUTATIONS with a materialized sort-key COLUMN,
  * making constant version-range filters parquet-pushable.
  *
  * [[ConstantVersionRangeRewrite]] turns `version_in_range(v, <const>)`
  * into `sort_key(s, v) >= 'lo' AND sort_key(s, v) < 'hi'` — cheap, but
  * still a function of `v`, so the predicate cannot reach the scan: the
  * data source sees an opaque expression and reads every row group. When
  * the relation was written through [[graft.sources.VersionKeyed]], the
  * key already EXISTS as a column whose metadata declares exactly what it
  * is (`graft.vkey.of` = the version column it keys, `graft.vkey.scheme`
  * = the scheme) — metadata that Spark round-trips through the parquet
  * footer, so the layout is self-describing and the substitution is sound
  * by the writer's contract, not by column-name guessing. After
  * substitution the filter is a plain string-bound comparison on a scan
  * column: it lands in `PushedFilters`, parquet row-group min/max stats
  * skip non-matching groups, and (with the keyed write's sort) a narrow
  * range reads a small fraction of the file.
  *
  * Both rules live in the same fixpoint batch, so the chain
  * `version_in_range → sort-key bounds → stored-column bounds` completes
  * within one optimizer pass. Rows-level semantics are unchanged: the
  * stored column was computed by the same `version_sort_key_native`
  * expression at write time.
  */
object MaterializedVersionKeyRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  /** The metadata names a COLUMN ("graft.vkey.of = version"), which is
    * only unambiguous within the relation that wrote it: across a join
    * (self-join, or any second table that also has a `version` column)
    * a name-only match could substitute the OTHER side's sort-key for
    * this side's version — silently wrong rows. So the substitution
    * additionally requires that the version attribute and the key
    * column trace to the SAME leaf relation by exprId. Aliased/derived
    * attributes get fresh exprIds, fail the leaf check, and fall back
    * to computing the key — conservative, never wrong. */
  private def sameRelation(child: LogicalPlan,
      a: AttributeReference, k: AttributeReference): Boolean =
    child.collectLeaves().exists { leaf =>
      val ids = leaf.output.map(_.exprId).toSet
      ids.contains(a.exprId) && ids.contains(k.exprId)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case vsk @ VersionSortKeyExpr(
            Literal(scheme, StringType), a: AttributeReference)
            if scheme != null =>
          child.output.collectFirst {
            case k: AttributeReference
                if k.metadata.contains(VK_OF) &&
                  k.metadata.getString(VK_OF) == a.name &&
                  k.metadata.contains(VK_SCHEME) &&
                  k.metadata.getString(VK_SCHEME) == scheme.toString &&
                  sameRelation(child, a, k) =>
              k
          }.getOrElse(vsk)
      }
      if (newCond.fastEquals(cond)) f else f.copy(condition = newCond)
  }

  private val VK_OF = graft.sources.VersionKeyed.OF_KEY
  private val VK_SCHEME = graft.sources.VersionKeyed.SCHEME_KEY
}
