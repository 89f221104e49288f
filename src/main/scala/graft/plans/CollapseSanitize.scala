package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule (SURVEY.md §4.2.6 candidate): collapse idempotent
  * sanitization chains.
  *
  * Pipelines assembled from reusable stages apply graft.ops.Sanitize at
  * every trust boundary, producing
  * `regexp_replace(regexp_replace(x, p, ''), p, '')` chains. Character-class
  * deletion with the same pattern is idempotent, so the inner application is
  * dead work — per row, per chain link. This rule rewrites the nested call
  * away at plan time.
  *
  * Conservative by construction: it only fires when both pattern and
  * replacement are identical string literals, the replacement is '' (pure
  * deletion — deletion with a character-class pattern is idempotent;
  * arbitrary replacements are NOT), and the pattern is a plain negated
  * character class (no anchors/backrefs/lookaround, whose deletion can be
  * non-idempotent).
  */
object CollapseSanitize extends Rule[LogicalPlan] {

  private val idempotentPattern = "^\\[\\^[^\\[\\]]*\\]$".r

  private def isIdempotentDeletion(pattern: Expression, replacement: Expression): Boolean =
    (pattern, replacement) match {
      case (Literal(p, StringType), Literal(r, StringType)) if r != null && r.toString.isEmpty =>
        p != null && idempotentPattern.findFirstIn(p.toString).isDefined
      case _ => false
    }

  private def isEmptyStringLit(e: Expression): Boolean = e match {
    case Literal(v, StringType) => v != null && v.toString.isEmpty
    case _ => false
  }

  /** Is `e` guaranteed to already contain no characters matching `pattern`?
    * True for a same-pattern deletion, and preserved through the
    * string-transparent wrappers graft.ops.Sanitize adds (string casts and
    * coalesce-with-''). */
  private def alreadyDeleted(e: Expression, pattern: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.RegExpReplace(_, p, r, _) =>
      p.semanticEquals(pattern) && isEmptyStringLit(r)
    case c: org.apache.spark.sql.catalyst.expressions.Cast if c.dataType == StringType =>
      alreadyDeleted(c.child, pattern)
    case org.apache.spark.sql.catalyst.expressions.Coalesce(children) =>
      children.nonEmpty &&
        children.forall(ch => alreadyDeleted(ch, pattern) || isEmptyStringLit(ch))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // The outer deletion is a no-op on input that the same deletion
      // already produced — drop it and return the child subtree.
      case org.apache.spark.sql.catalyst.expressions.RegExpReplace(child, p, r, _)
          if isIdempotentDeletion(p, r) && alreadyDeleted(child, p) =>
        child
    }
}

/** Session extensions: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or spark.sql.extensions=graft.plans.GraftExtensions)
  * injects the optimizer rule; the cosine expression is registered as a SQL
  * function here too, making the whole custom surface one opt-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CollapseSanitize)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => graft.functions.CosineSimilarity(exprs(0), exprs(1))))
  }
}
