package graft.plans

import graft.functions.{CosinePrefixSims, CosineSimilarity}
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Expression, Literal, Slice}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** KERNEL-FUSION optimizer rule: several dimension-prefix cosines over the
  * SAME vector pair collapse into one [[CosinePrefixSims]] pass.
  *
  * A user evaluating embedding truncation writes the portable form —
  * `cosine_sim(slice(a, 1, m), slice(b, 1, m))` once per depth m — which
  * re-reads the prefix and allocates two sliced arrays per candidate per
  * depth, in the N×Q inner loop ANN evaluation burns its cycles (see
  * [[CosinePrefixSims]]'s scaladoc; `x_embed_mrl_recall` calls the fused
  * kernel by hand for exactly this reason). This rule makes the portable
  * form fast automatically: within one operator's expression list, all
  * prefix-cosine occurrences over the same (a, b) — same by
  * `canonicalized` plan, literal start 1, literal positive length — are
  * rewritten to `element_at(cosine_prefix(a, b, dims), idx)` with one
  * shared dims array. Whole-stage codegen's subexpression elimination then
  * evaluates the shared kernel ONCE per row, so k depths cost one
  * accumulator pass instead of k slice+fold passes.
  *
  * Semantics are unchanged BIT-FOR-BIT: each kernel checkpoint is defined
  * as (and `MrlSpec` pins it equal to) the per-slice fold it replaces,
  * including the over-length clamp and the null-on-length-mismatch edge
  * (`element_at` of the null array is null, exactly as each per-slice
  * cosine was). Fusion triggers only at ≥2 distinct depths — a single
  * occurrence gains nothing and keeps its simpler plan.
  *
  * Wire-up: injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) at session build, or added to a live session
  * via `spark.experimental.extraOptimizations` (the test path). */
object FusePrefixCosines extends Rule[LogicalPlan] {

  /** Matches `cosine_sim(slice(a, 1, m), slice(b, 1, m))` with literal
    * int bounds, the same positive m on both sides, deterministic a/b. */
  private object PrefixCosine {
    def unapply(e: Expression): Option[(Expression, Expression, Int)] = e match {
      case CosineSimilarity(
          Slice(a, Literal(1, _), Literal(m1: Int, _)),
          Slice(b, Literal(1, _), Literal(m2: Int, _)))
          if m1 == m2 && m1 > 0 && a.deterministic && b.deterministic =>
        Some((a, b, m1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case op =>
      val dims = op.expressions
        .flatMap(_.collect { case PrefixCosine(a, b, m) =>
          ((a.canonicalized, b.canonicalized), m)
        })
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
        .filter(_._2.length >= 2)
      if (dims.isEmpty) op
      else op.mapExpressions(_.transformUp {
        case e @ PrefixCosine(a, b, m) =>
          dims.get((a.canonicalized, b.canonicalized)) match {
            case Some(ds) =>
              ElementAt(CosinePrefixSims(a, b, ds), Literal(ds.indexOf(m) + 1))
            case None => e
          }
      })
  }
}
