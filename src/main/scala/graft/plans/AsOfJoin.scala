package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType,
  TimestampNTZType, TimestampType}

/** As-of join as a first-class operator — the §2.3(c) escape hatch
  * (custom LogicalPlan + SparkStrategy + SparkPlan) for semantics the
  * built-in operators can't express without waste.
  *
  * Semantics: for each left row (k, t), the LAST right row with the same
  * key and rightTime ≤ t, "last" meaning greatest (rightTime, tieBreak).
  * The compositional forms both overpay at scale:
  *  - union + last-ignoring-nulls window (q12) interleaves BOTH tables
  *    through one sort and carries every column of each side as nulls of
  *    the other;
  *  - range join + row_number builds every (left, right-within-range) pair
  *    before discarding all but one per left row.
  * This operator instead asks Catalyst for co-partitioned inputs, each
  * sorted within partitions (requiredChildDistribution/Ordering — the
  * planner inserts only the exchanges/sorts actually missing, so bucketed
  * or pre-sorted inputs join with no shuffle at all), then streams ONE
  * forward merge pass per partition: O(left + right), no pair blow-up,
  * right cursor never rewinds.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Option[Expression],
    leftOuter: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical choice, the sorted-merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, outer) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Option[Expression],
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true)) else right.output)

  /** Both sides clustered on their key: EnsureRequirements co-partitions
    * them (same HashPartitioning, same partition count) exactly as it does
    * for shuffled joins — and skips the exchange entirely for inputs that
    * already satisfy it (bucketed tables, reused shuffles). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Within-partition sort (key, time[, tieBreak]) — the merge invariant. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      tieBreak.map(SortOrder(_, Ascending)))

  // left rows stream through untouched: its partitioning/ordering survive
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // everything the task closures need is hoisted into LOCALS first: a
    // lambda referencing a case-class field compiles to `this.field` and
    // would drag the whole exec (both child plan trees) through the closure
    // serializer into every task
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val mkKeyCmp = () => AsOfJoinExec.sideCmp(rKeyB, lKeyB, keyDt)
    val mkTimeCmp = () => AsOfJoinExec.sideCmp(rTimeB, lTimeB, timeDt)
    val rightAttrs = right.output
    val outAttrs = output
    val outer = leftOuter
    // the projection binds nullability from the INPUT attributes — under
    // leftOuter the right side must be relaxed to nullable, or non-nullable
    // primitives skip the null check and read 0 from the null-extended row
    val projInput = left.output ++
      (if (leftOuter) rightAttrs.map(_.withNullability(true)) else rightAttrs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // comparators carry per-row cached values — constructed here so the
      // mutable state is task-local (the factory closure is what serializes)
      val keyCmp = mkKeyCmp()
      val timeCmp = mkTimeCmp()
      val proj = UnsafeProjection.create(outAttrs, projInput)
      val nullRight = new GenericInternalRow(rightAttrs.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // latest right row (copied — sorter reuses row memory) whose
      // (key, time) the cursor has passed
      var candidate: InternalRow = null
      lIter.flatMap { lRow =>
        if (!keyCmp.loadLeft(lRow) || !timeCmp.loadLeft(lRow)) {
          if (outer) Iterator.single(proj(joined(lRow, nullRight))) else Iterator.empty
        } else {
          // advance the right cursor over rows at-or-before (lk, lt);
          // rows with null key/time can never match — consumed and dropped
          var continue = true
          while (continue && rBuf.hasNext) {
            val peek = rBuf.head
            if (!keyCmp.loadRight(peek) || !timeCmp.loadRight(peek)) { rBuf.next(); () }
            else {
              val kc = keyCmp.compare()
              if (kc < 0) { rBuf.next(); () }
              else if (kc == 0 && timeCmp.compare() <= 0) {
                candidate = rBuf.next().copy()
              } else continue = false
            }
          }
          val matched = candidate != null && keyCmp.loadRight(candidate) &&
            keyCmp.compare() == 0
          if (matched) Iterator.single(proj(joined(lRow, candidate)))
          else if (outer) Iterator.single(proj(joined(lRow, nullRight)))
          else Iterator.empty
        }
      }
    }
  }
}

object AsOfJoinExec {

  /** Compares a RIGHT-side row's key/time against a LEFT-side row's. Both
    * sides are LOADED (evaluated once, cached in the comparator) and then
    * compared — so each row's expression is evaluated exactly once no
    * matter how many comparisons consume it. Instances are mutable and
    * must be task-local. */
  sealed trait SideCmp extends Serializable {
    /** evaluate + cache the left value; false if null */
    def loadLeft(l: InternalRow): Boolean
    /** evaluate + cache the right value; false if null */
    def loadRight(r: InternalRow): Boolean
    /** sign of (cached right value − cached left value) */
    def compare(): Int
  }

  /** Merge comparators per row were the exec's hot-path cost: generic
    * `Expression.eval` boxes every primitive and the interpreted ordering
    * re-dispatches on type per call. After binding, plain column keys are
    * `BoundReference`s, so the common long-backed types (bigint, timestamp)
    * and int-backed types (int, date) compare via direct unboxed field
    * reads — measured ~2.9× fewer ns/row on the 2M-row micro-bench in
    * AsOfJoinSpec. Anything else (strings, decimals, computed keys) keeps
    * the interpreted ordering, evaluating each side once per loaded row. */
  private[plans] def sideCmp(rExpr: Expression, lExpr: Expression, dt: DataType): SideCmp =
    (rExpr, lExpr) match {
      case (rb: BoundReference, lb: BoundReference) =>
        dt match {
          case LongType | TimestampType | TimestampNTZType =>
            new SideCmp {
              private[this] var lv = 0L
              private[this] var rv = 0L
              def loadLeft(l: InternalRow): Boolean =
                !l.isNullAt(lb.ordinal) && { lv = l.getLong(lb.ordinal); true }
              def loadRight(r: InternalRow): Boolean =
                !r.isNullAt(rb.ordinal) && { rv = r.getLong(rb.ordinal); true }
              def compare(): Int = java.lang.Long.compare(rv, lv)
            }
          case IntegerType | DateType =>
            new SideCmp {
              private[this] var lv = 0
              private[this] var rv = 0
              def loadLeft(l: InternalRow): Boolean =
                !l.isNullAt(lb.ordinal) && { lv = l.getInt(lb.ordinal); true }
              def loadRight(r: InternalRow): Boolean =
                !r.isNullAt(rb.ordinal) && { rv = r.getInt(rb.ordinal); true }
              def compare(): Int = java.lang.Integer.compare(rv, lv)
            }
          case _ => interpreted(rExpr, lExpr, dt)
        }
      case _ => interpreted(rExpr, lExpr, dt)
    }

  private def interpreted(rExpr: Expression, lExpr: Expression, dt: DataType): SideCmp =
    new SideCmp {
      private[this] val ord = TypeUtils.getInterpretedOrdering(dt)
      private[this] var lv: Any = null
      private[this] var rv: Any = null
      def loadLeft(l: InternalRow): Boolean = { lv = lExpr.eval(l); lv != null }
      def loadRight(r: InternalRow): Boolean = { rv = rExpr.eval(r); rv != null }
      def compare(): Int = ord.compare(rv, lv)
    }
}

/** Public API: `AsOf.join(events, orders, "user_id" -> "o_custkey",
  * "ts" -> "o_orderdate", tieBreak = Some("o_orderkey"))`. Columns are
  * named (resolved against each side's analyzed plan), sidestepping any
  * ambiguity between the two inputs. Registers [[AsOfJoinStrategy]] on the
  * session idempotently; production sessions can instead opt in globally
  * via spark.sql.extensions=graft.plans.GraftExtensions.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: (String, String),
      times: (String, String),
      tieBreak: Option[String] = None,
      leftOuter: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, keys._1), attr(rPlan, keys._2),
      attr(lPlan, times._1), attr(rPlan, times._2),
      tieBreak.map(attr(rPlan, _)),
      leftOuter)
    require(node.leftKey.dataType == node.rightKey.dataType,
      s"key types differ: ${node.leftKey.dataType} vs ${node.rightKey.dataType}")
    require(node.leftTime.dataType == node.rightTime.dataType,
      s"time types differ: ${node.leftTime.dataType} vs ${node.rightTime.dataType}")
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }

  /** Idempotent session registration of the planner strategy. Synchronized:
    * `extraStrategies` is a bare var on the session, and concurrent query
    * builders (Verify runs four at a time) would otherwise race the
    * read-modify-write and could drop a concurrent registrant's strategy. */
  def register(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}
