package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite `nullif(a, v) IS NOT NULL` (v a non-null
  * literal) into `a IS NOT NULL AND a <> v`.
  *
  * Why it matters at scale: the NULLIF form optimizes to
  * `IsNotNull(CASE WHEN a = v THEN NULL ELSE a END)`, which the parquet
  * data source cannot translate — the predicate evaluates post-scan and
  * row-group min/max skipping is forfeited. The rewritten conjunction
  * pushes down as `IsNotNull(a), Not(EqualTo(a, v))` (visible in
  * `PushedFilters`). The round-3 review caught exactly this defect in two
  * hand-written template queries; since the engine's surface is arbitrary
  * user SQL (the reference delegates verbatim strings —
  * /root/reference/src/duckdb.ts:46-49), the fix belongs in the optimizer,
  * not in each query.
  *
  * Correctness: the two forms are equivalent EVERYWHERE, not just under a
  * Filter — case a NULL: IsNotNull(NULL)=false vs false AND NULL = false;
  * case a = v: IsNotNull(NULL)=false vs true AND false = false; else true
  * vs true. The guard `v.value != null` excludes `nullif(a, NULL)`, where
  * the conjunction would yield NULL instead of true for non-null a.
  *
  * Registered through `SparkSessionExtensions` (Session.builder), the
  * public extension point for engine-level rules.
  */
object NullifPushdown extends Rule[LogicalPlan] {

  private def rewrite(a: Expression, v: Literal): Expression =
    And(IsNotNull(a), Not(EqualTo(a, v)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // Every case guards on a.deterministic: the rewrite evaluates `a`
      // twice (IsNotNull(a) AND a <> v), which diverges for e.g. rand() —
      // and the rule also matches hand-written CASE shapes, not just
      // NullIf expansions (ADVICE r5).
      // post-ReplaceExpressions shape: CASE WHEN a = v THEN NULL ELSE a END
      case IsNotNull(If(EqualTo(a, v: Literal), Literal(null, _), elseB))
          if v.value != null && elseB.semanticEquals(a) && a.deterministic =>
        rewrite(a, v)
      // pre-replacement shape, in case the rule runs before ReplaceExpressions
      case IsNotNull(NullIf(a, v: Literal, _))
          if v.value != null && a.deterministic =>
        rewrite(a, v)
      // after SimplifyConditionals/NullPropagation, which run before user
      // rules: CASE WHEN a = v THEN false ELSE isnotnull(a) END
      case If(EqualTo(a, v: Literal),
            Literal(false, org.apache.spark.sql.types.BooleanType),
            IsNotNull(elseA))
          if v.value != null && elseA.semanticEquals(a) && a.deterministic =>
        rewrite(a, v)
    }

  /** Injection hook for `SparkSession.builder().withExtensions`. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => NullifPushdown)
}
