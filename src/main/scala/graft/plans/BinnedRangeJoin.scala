package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive interval-containment join into the
  * binned equi-join plan of [[graft.operators.RangeJoin]] —
  * automatically, so a user who writes the obvious
  * `points JOIN intervals ON t BETWEEN lo AND hi` gets the
  * scale-safe plan instead of a BroadcastNestedLoopJoin (every point
  * × every interval).
  *
  * This is the (c)-tier extension point of the build rules — a
  * `Rule[LogicalPlan]` via `SparkSessionExtensions` — used where
  * composition can't help: the fix must apply to plans the USER
  * writes, before the planner freezes them into a nested loop. The
  * same idea ships as range-join optimization in Databricks Photon
  * and as Spark's own stream-stream interval join planning; beehive
  * itself never needs it only because it is row-at-a-time JS.
  *
  * Match: an Inner join whose condition, split into conjuncts,
  * contains a lower bound (`t >= lo` / `t > lo`) AND an upper bound
  * (`t <= hi` / `t < hi`) on the SAME integral point expression `t`
  * from one side, with both bounds from the other side — and NO
  * equi-conjunct (if one exists, the join already hash-partitions;
  * rewriting would only add work).
  *
  * Rewrite (bins of width `spark.graft.rangeJoin.binWidth`):
  * {{{
  *   points JOIN intervals ON lo <= t AND t <= hi
  * ⇒ Project(original output,
  *     Join(
  *       Project(points + __bin_p = t div W),
  *       Generate(explode(sequence(lo div W, hi div W)) AS __bin_i,
  *                Filter(lo <= hi, intervals)),
  *       Inner, __bin_p = __bin_i AND <original condition>))
  * }}}
  *
  * Correctness notes, mirrored from the operator form:
  *  - `div` (truncating integral divide) is monotone non-decreasing,
  *    so `lo <= t <= hi` implies `lo div W <= t div W <= hi div W`:
  *    every qualifying pair meets in the point's bin — for negative
  *    values too (trunc ≠ floor only shifts WHICH bin holds a value,
  *    identically on both sides; the one fan-out nuance is that
  *    trunc's bin 0 spans 2W−1 values — twice floor's width — so
  *    zero-straddling data sees a slightly hotter middle bucket,
  *    never a wrong result. [[graft.operators.RangeJoin]] bins with
  *    floor; the two paths' bin IDS differ on negatives while both
  *    join correctly).
  *  - a pair meets in EXACTLY one bin (a point has one bin), so the
  *    rewrite needs no dedup.
  *  - inverted intervals (lo > hi) are filtered BEFORE sequence(),
  *    which would otherwise step downward (huge arrays / errors)
  *    instead of yielding zero rows.
  *  - the full original condition is kept as a residual filter, so
  *    strict bounds and any extra conjuncts keep their semantics.
  *
  * The rule is conf-gated (default off) and idempotent by
  * construction: the rewritten join HAS an equi-conjunct, so it can
  * never match again within the fixed-point batch.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        extractRange(j, cond) match {
          case None => j
          case Some((t, lo, hi, pointsOnLeft)) =>
        // conf parsed only when a rewrite actually fires — a typo'd
        // value must fail THIS join's optimization with the key named,
        // not every SELECT 1 in the session
        def confLong(key: String, dflt: String): Long = {
          val raw = conf.getConfString(key, dflt)
          try raw.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"$key must be a long, got '$raw'")
          }
        }
        val binWidth = confLong(BinWidthKey, "3600")
        require(binWidth > 0, s"$BinWidthKey must be positive, got $binWidth")
        // bins-per-interval cap: a mis-unitted binWidth (seconds conf
        // on microsecond data) or a far-future sentinel hi would
        // explode each interval into millions of bins and die as an
        // opaque executor OOM / sequence-length error — fail loudly
        // with the knob named instead
        val maxBins = confLong(MaxBinsKey, "65536")
        val w = Literal(binWidth, LongType)
        val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)

        val binP = Alias(div(t, w), "__graft_bin_p")()
        val binnedPoints = Project(points.output :+ binP, points)

        val binCount = Add(Subtract(div(hi, w), div(lo, w)), Literal(1L, LongType))
        val capOk = If(LessThanOrEqual(binCount, Literal(maxBins, LongType)),
          Literal(true),
          Cast(RaiseError(Literal(
            s"graft range join: an interval spans more than $maxBins bins of width " +
              s"$binWidth — check $BinWidthKey against the column's unit, or raise " +
              s"$MaxBinsKey")), org.apache.spark.sql.types.BooleanType))
        val liveIntervals = Filter(And(LessThanOrEqual(lo, hi), capOk), intervals)
        // constructed AFTER analysis, so the time-zone-aware Sequence
        // must be given its zone explicitly or the plan goes unresolved
        val seq = new Sequence(div(lo, w), div(hi, w), Some(Literal(1L, LongType)))
          .withTimeZone(conf.sessionLocalTimeZone)
        val binI = AttributeReference("__graft_bin_i", LongType, nullable = false)()
        val binnedIntervals = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binI),
          child = liveIntervals)

        val (newLeft, newRight) =
          if (pointsOnLeft) (binnedPoints, binnedIntervals)
          else (binnedIntervals, binnedPoints)
        val newCond = And(EqualTo(binP.toAttribute, binI), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }

  private def div(e: Expression, w: Literal): Expression =
    new IntegralDivide(Cast(e, LongType), w)

  /** A conjunct as an ordered bound `small <= / < big`. */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType => true
    case _ => false
  }

  /** Find (t, lo, hi, pointsOnLeft): the same point expression bounded
    * below and above by expressions from the opposite side. */
  private def extractRange(j: Join, cond: Expression)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromOnly(e: Expression, p: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet) && e.deterministic
    // an existing equi-conjunct means the join already has a hash key
    // (EqualNullSafe plans to a hash key just like EqualTo — rewriting
    // such a join would only add a redundant Generate + second key)
    val hasEquiKey = conjuncts.exists {
      // Equality matches EqualTo AND EqualNullSafe — both plan to a
      // hash key
      case Equality(a, b) =>
        (fromOnly(a, j.left) && fromOnly(b, j.right)) ||
          (fromOnly(a, j.right) && fromOnly(b, j.left))
      case _ => false
    }
    if (hasEquiKey) return None
    val bounds = conjuncts.flatMap(asBound)
    def find(points: LogicalPlan, intervals: LogicalPlan, pointsOnLeft: Boolean) = {
      val lowers = bounds.filter { case (lo, t) =>
        fromOnly(lo, intervals) && fromOnly(t, points) && integral(lo) && integral(t) }
      val uppers = bounds.filter { case (t, hi) =>
        fromOnly(t, points) && fromOnly(hi, intervals) && integral(t) && integral(hi) }
      (for {
        (lo, t1) <- lowers; (t2, hi) <- uppers if t1.semanticEquals(t2)
      } yield (t1, lo, hi, pointsOnLeft)).headOption
    }
    find(j.left, j.right, pointsOnLeft = true)
      .orElse(find(j.right, j.left, pointsOnLeft = false))
  }

  // splitConjunctivePredicates comes from PredicateHelper — Catalyst's
  // own And-splitter, not a private re-implementation
}
