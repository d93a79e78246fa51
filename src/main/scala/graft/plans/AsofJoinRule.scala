package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the naive as-of-join idiom — a history
  * join exploded per (left row × its whole right history) and then
  * winnowed back to one row with `row_number() = 1` — into the
  * union+window plan of [[graft.operators.AsOf.asofJoin]].
  *
  * The idiom every SQL user writes first (the reference's workloads
  * are full of "latest state at time t" lookups — e.g. the latest
  * observation at or before an encounter, person-users.js:307's
  * newest-row selection):
  * {{{
  *   SELECT * FROM (
  *     SELECT l.*, r.*, ROW_NUMBER() OVER
  *       (PARTITION BY l.id ORDER BY r.ts DESC) AS rn
  *     FROM l JOIN r ON l.k = r.k AND r.ts <= l.ts) WHERE rn = 1
  * }}}
  * The inner join materializes Σ|matches per left row| rows — on a
  * slowly-changing right table that is |L|·|history|, quadratic per
  * key — only for the window to throw all but |L| of them away. The
  * e9/BinnedRangeJoinRule lesson applies: the fix must reach plans the
  * USER writes, so it is a `Rule[LogicalPlan]` behind
  * `SparkSessionExtensions`, conf-gated (default off) like its range
  * sibling.
  *
  * Rewrite: ONLY the Join child is swapped; the user's Filter and
  * Window stay on top. The join becomes
  * {{{
  *   Project(join output,
  *     Filter(__side = <left> AND __asof IS NOT NULL,
  *       Window(last(__asof, ignoreNulls) OVER
  *                (PARTITION BY __k ORDER BY __t, __side, __tie),
  *         Union(
  *           Project(left:  k, lt as __t, sideL, null tie, null struct, left cols),
  *           Project(Filter(k IS NOT NULL, right):
  *                   k, rt as __t, sideR, tie, struct(right cols) as __asof, null left cols)))))
  * }}}
  * — one shuffle on the key, one in-partition sort, |L|+|R| rows
  * total; each surviving row is a left row with its LATEST right row
  * ≤ its time carried as one atomic struct (never a column mix of two
  * right rows). Right attributes are re-exposed from the struct under
  * their ORIGINAL exprIds, so the untouched Filter/Window above
  * resolve unchanged.
  *
  * Keeping the user's Window makes the rewrite correct for ANY
  * partition spec over left attributes: per-left-row winners maximize
  * r.ts for each left row, so the group-wise max the window then
  * takes is the same pair the naive plan picked — but over |L| rows,
  * not the exploded join. (When PARTITION BY is a left unique id —
  * the common spelling — the window is a no-op pass at |L| cost.)
  *
  * Match requirements (strict, else leave the plan alone):
  *  - `Filter(rn = 1 | rn <= 1, Window([rn := row_number()], P, OS, join))`
  *    where the filter condition's OTHER conjuncts don't touch `rn`'s
  *    siblings (single window expression only);
  *  - the join is Inner with condition = ≥1 equi-conjunct (left key =
  *    right key) + EXACTLY one bound `r.ts <= l.ts` (or strict `<`)
  *    and nothing else (a residual conjunct would have to filter
  *    candidate pairs BEFORE the latest-pick — not expressible after);
  *  - P references only left attributes; OS is `[r.ts DESC]` or
  *    `[r.ts DESC, tie DESC]` with `tie` from the right side (the
  *    tie-break is honored in the union sort; with neither a tie nor
  *    unique (key, ts) right rows the original plan was
  *    nondeterministic on ties and so is this one);
  *  - left and right time types equal, key types equal pairwise.
  *
  * Idempotent by construction: the rewritten subtree has no Join
  * under the user's Window, so the pattern cannot match again.
  */
object AsofJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.asofJoin.enabled"

  // DataType.sameType is private[sql]; structural equality ignoring
  // nullability is the public spelling of the same check
  private def sameType(a: org.apache.spark.sql.types.DataType,
                       b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsStructurally(a, b, ignoreNullability = true)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(fc,
            w @ Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(), _), _)), p, os, wchild, _))
          if keepsRankOne(fc, rnAlias.toAttribute) =>
        // the join may sit under a column-pruning Project and/or the
        // WindowGroupLimit the optimizer slides below rank filters;
        // the rewrite reproduces the join's exact output attribute
        // ids, so those wrappers carry over unchanged on top of it
        def swapJoin(node: LogicalPlan): Option[LogicalPlan] = node match {
          case j: Join => rewrite(j, p, os)
          case pr: Project if pr.projectList.forall(_.deterministic) =>
            swapJoin(pr.child).map(n => pr.copy(child = n))
          case g @ WindowGroupLimit(_, _, RowNumber(), 1, _) =>
            swapJoin(g.child).map(n => g.copy(child = n))
          case _ => None
        }
        swapJoin(wchild).map(a => f.copy(child = w.copy(child = a))).getOrElse(f)
    }
  }

  /** The filter keeps exactly the rank-1 rows: some conjunct is
    * `rn = 1` / `rn <= 1` / `1 >= rn`. Other conjuncts may do
    * anything — they apply identically before/after the swap. */
  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(r: Attribute, IntegerLiteral(1)) => r.semanticEquals(rn)
      case EqualTo(IntegerLiteral(1), r: Attribute) => r.semanticEquals(rn)
      case LessThanOrEqual(r: Attribute, IntegerLiteral(1)) => r.semanticEquals(rn)
      case GreaterThanOrEqual(IntegerLiteral(1), r: Attribute) => r.semanticEquals(rn)
      case LessThan(r: Attribute, IntegerLiteral(2)) => r.semanticEquals(rn)
      case _ => false
    }

  private def rewrite(j: Join, partSpec: Seq[Expression],
                      orderSpec: Seq[SortOrder]): Option[LogicalPlan] = j match {
    // the preserved (probe) side may be EITHER join child — the
    // window's partition spec names it; try both orientations
    case Join(jl, jr, Inner, Some(cond), _) =>
      rewriteOriented(jl, jr, cond, partSpec, orderSpec, j.output)
        .orElse(rewriteOriented(jr, jl, cond, partSpec, orderSpec, j.output))
    case _ => None
  }

  /** The union+window build for one orientation: `probe` rows are
    * preserved, `hist` supplies the latest-at-or-before match. */
  private def rewriteOriented(probe: LogicalPlan, hist: LogicalPlan, cond: Expression,
                              partSpec: Seq[Expression], orderSpec: Seq[SortOrder],
                              jOutput: Seq[Attribute]): Option[LogicalPlan] = {
    def fromOnly(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic
    // the kept window's groups must be probe-row groups
    if (!partSpec.forall(e => e.references.subsetOf(probe.outputSet) && e.deterministic))
      return None
    val conjuncts = splitConjunctivePredicates(cond)
    val equis = conjuncts.collect {
      case EqualTo(a, b) if fromOnly(a, probe) && fromOnly(b, hist) => (a, b)
      case EqualTo(a, b) if fromOnly(a, hist) && fromOnly(b, probe) => (b, a)
    }
    if (equis.isEmpty || equis.exists { case (a, b) => !sameType(a.dataType, b.dataType) })
      return None
    // exactly one hist.ts ≤/< probe.ts bound; nothing else in the condition
    val bounds = conjuncts.collect {
      case LessThanOrEqual(ht, pt) if fromOnly(ht, hist) && fromOnly(pt, probe) => (ht, pt, false)
      case GreaterThanOrEqual(pt, ht) if fromOnly(ht, hist) && fromOnly(pt, probe) => (ht, pt, false)
      case LessThan(ht, pt) if fromOnly(ht, hist) && fromOnly(pt, probe) => (ht, pt, true)
      case GreaterThan(pt, ht) if fromOnly(ht, hist) && fromOnly(pt, probe) => (ht, pt, true)
    }
    if (bounds.length != 1 || conjuncts.length != equis.length + 1) return None
    val (ht, pt, strict) = bounds.head
    if (!sameType(ht.dataType, pt.dataType) ||
      !RowOrdering.isOrderable(ht.dataType)) return None
    // window order: hist.ts DESC first, optional hist-side tie DESC
    val tie: Option[Expression] = orderSpec match {
      case Seq(SortOrder(t, Descending, _, _)) if t.semanticEquals(ht) => None
      case Seq(SortOrder(t, Descending, _, _), SortOrder(tb, Descending, _, _))
          if t.semanticEquals(ht) && fromOnly(tb, hist) &&
            RowOrdering.isOrderable(tb.dataType) => Some(tb)
      case _ => return None
    }

    // ≤: hist rows sort BEFORE the probe row at equal times so the
    // running last() includes them; <: after, so they don't
    val (sideH, sideP) = if (strict) (1, 0) else (0, 1)
    val tieExpr = tie.getOrElse(ht)
    val payload = CreateStruct(hist.output)

    val kP = equis.map(_._1).zipWithIndex.map { case (e, i) => Alias(e, s"__k$i")() }
    val probeProj = Project(
      probe.output ++ (kP :+
        Alias(pt, "__t")() :+
        Alias(Literal(sideP, IntegerType), "__side")() :+
        Alias(Literal.create(null, tieExpr.dataType), "__tie")() :+
        Alias(Literal.create(null, payload.dataType), "__asof")()),
      probe)
    // null-keyed hist rows can match nothing; dropping them keeps
    // the window's null-key group from "matching" null-keyed probes.
    // A null hist TIME must go too: the original inner join's
    // `ht <= pt` is NULL for it, but in the union window it would
    // sort NULLS FIRST ahead of every probe row and get carried.
    val histFiltered = Filter(
      (equis.map(e => IsNotNull(e._2): Expression) :+ (IsNotNull(ht): Expression))
        .reduce(And), hist)
    val histProj = Project(
      probe.output.map(a => Alias(Literal.create(null, a.dataType), a.name)()) ++
        (equis.map(_._2).zipWithIndex.map { case (e, i) => Alias(e, s"__k$i")() } :+
          Alias(ht, "__t")() :+
          Alias(Literal(sideH, IntegerType), "__side")() :+
          Alias(tieExpr, "__tie")() :+
          Alias(payload, "__asof")()),
      histFiltered)
    val union = Union(Seq(probeProj, histProj))

    val uOut = union.output
    val nProbe = probe.output.length
    val kAttrs: Seq[Expression] = uOut.slice(nProbe, nProbe + equis.length)
    val Seq(tAttr, sideAttr, tieAttr, asofAttr) = uOut.takeRight(4)
    val sort = Seq(
      SortOrder(tAttr, Ascending),
      SortOrder(sideAttr, Ascending),
      SortOrder(tieAttr, Ascending, NullsFirst, Seq.empty))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val carried = Alias(
      WindowExpression(
        AggregateExpression(Last(asofAttr, ignoreNulls = true), Complete, isDistinct = false),
        WindowSpecDefinition(kAttrs, sort, frame)),
      "__asof_carried")()
    val win = Window(Seq(carried), kAttrs, sort, union)
    val keep = Filter(
      And(EqualTo(sideAttr, Literal(sideP, IntegerType)), IsNotNull(carried.toAttribute)),
      win)
    // restore the join's exact output attributes IN ITS OUTPUT ORDER:
    // probe columns pass through (same exprIds through Union's first
    // child); hist columns re-emerge from the carried struct UNDER
    // THEIR ORIGINAL exprIds so the untouched Filter/Window above
    // resolve unchanged whichever child the history side was
    val probeById = uOut.take(nProbe).map(a => a.exprId -> (a: NamedExpression)).toMap
    val histById = hist.output.zipWithIndex.map { case (a, i) =>
      a.exprId -> (Alias(GetStructField(carried.toAttribute, i, Some(a.name)),
        a.name)(exprId = a.exprId): NamedExpression)
    }.toMap
    val restored = jOutput.map(a => probeById.getOrElse(a.exprId, histById(a.exprId)))
    Some(Project(restored, keep))
  }
}
