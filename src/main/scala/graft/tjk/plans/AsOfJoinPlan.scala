package graft.tjk.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** O1 as a first-class Catalyst operator (SURVEY.md §4.3 optional extension
  * 2): a logical as-of join node + planner strategy + streaming sort-merge
  * physical operator, instead of the union-tag window composition.
  *
  * Why a whole-operator extension is justified here (and only here): the
  * union-tag primary path pays one exchange over `spine ∪ events` and one
  * Window pass that materializes running `last(payload)` state per row; the
  * native operator shuffles each side once by entity, sorts, and streams a
  * two-pointer merge with O(1) state — no union, no struct-packing of the
  * payload, no Window buffer. Semantics identical to [[graft.tjk.AsOf]]
  * (backward match, `ts ≤ asof_ts` or strict `<`, ties by greatest tie
  * column, optional tolerance) — equivalence is property-tested.
  *
  * Both sides arrive prepared by the API wrapper
  * ([[graft.tjk.AsOf.asofJoinNative]]): timestamps pre-converted to long
  * micros, right side reduced to (entity, ts, tie, payload…) with fresh
  * attribute ids so the binary node cannot see conflicting ids.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftEntity: Attribute,
    rightEntity: Attribute,
    leftTsMicros: Attribute,
    rightTsMicros: Attribute,
    rightTie: Attribute,
    payload: Seq[Attribute],
    strict: Boolean,
    toleranceMicros: Option[Long]) extends BinaryNode {

  /** Left rows pass through unchanged; payload is nullable (unmatched). */
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; inert for every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(
        p.leftEntity, p.rightEntity, p.leftTsMicros, p.rightTsMicros,
        p.rightTie, p.payload, p.strict, p.toleranceMicros,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.tjk.plans.TjkExtensions` — config-time
  * registration for production `spark-submit`. In-library calls also inject
  * the strategy at runtime (Bridge.injectStrategy), so either path works.
  */
class TjkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
}
