package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure id-window RANGE join
  *
  * {{{ a JOIN b ON b.id > a.id AND b.id <= a.id + W }}}
  *
  * into a bucketed EQUI-join. Spark plans the pure inequality condition
  * as BroadcastNestedLoopJoin — O(|a|·|b|) predicate evaluations and a
  * full broadcast of one side, a scale-killer — but for rows satisfying
  * the window, `b.id div W` is provably in
  * `{a.id div W, a.id div W + 1}` (holds for truncating division over
  * ALL integers, negatives included, because div(x + W) ≤ div(x) + 1).
  * So the small side explodes into those two buckets, the big side
  * computes one bucket, and the added bucket-equality conjunct turns
  * the join into a shuffled hash / sort-merge join with candidate
  * space O(n · W); the original range predicate still filters exactly.
  *
  * Fires only on Inner joins whose condition has NO equi-conjunct (the
  * case that would otherwise nest-loop) and contains a strict lower
  * bound `big > small` plus an upper bound `big <= small + literal` on
  * integral attributes from opposite sides. The rewrite preserves the
  * original condition verbatim, so results are identical.
  *
  * Register with `SparkSessionExtensions` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`), or rely on
  * the explicit bucketed formulation in `Dedup.idWindowPairs` — this
  * rule makes the naive spelling safe too.
  */
object RewriteIdWindowRangeJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private object WindowLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j, cond) =>
      val cs = conjuncts(cond)
      // strict lower bounds: big > small
      val lowers = cs.collect {
        case GreaterThan(b: AttributeReference, a: AttributeReference) => (a, b)
        case LessThan(a: AttributeReference, b: AttributeReference) => (a, b)
      }
      // upper bounds with a constant window: big <= small + W
      val uppers = cs.collect {
        case LessThanOrEqual(b: AttributeReference,
            Add(a: AttributeReference, WindowLiteral(w), _)) => (a, b, w)
        case GreaterThanOrEqual(Add(a: AttributeReference, WindowLiteral(w), _),
            b: AttributeReference) => (a, b, w)
      }
      val pair = uppers.collectFirst {
        case (a, b, w)
            if w > 0 && integral(a) && integral(b) &&
              lowers.exists(l => l._1.semanticEquals(a) && l._2.semanticEquals(b)) &&
              ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
                (left.outputSet.contains(b) && right.outputSet.contains(a))) =>
          (a, b, w)
      }
      pair match {
        case None => j
        case Some((small, big, w)) =>
          val smallOnLeft = left.outputSet.contains(small)
          val smallSide = if (smallOnLeft) left else right
          val bigSide = if (smallOnLeft) right else left

          val width = Literal(w, LongType)
          val divSmall = IntegralDivide(Cast(small, LongType), width)
          val bucketSmall = AttributeReference("__graft_rj_bucket", LongType,
            nullable = divSmall.nullable)()
          val gen = Generate(
            Explode(CreateArray(Seq(divSmall, Add(divSmall, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketSmall), child = smallSide)

          val bigAlias = Alias(IntegralDivide(Cast(big, LongType), width),
            "__graft_rj_bucket_b")()
          val projBig = Project(bigSide.output :+ bigAlias, bigSide)

          val eq = EqualTo(bucketSmall, bigAlias.toAttribute)
          val (newLeft, newRight) =
            if (smallOnLeft) (gen: LogicalPlan, projBig: LogicalPlan)
            else (projBig: LogicalPlan, gen: LogicalPlan)
          Project(j.output, Join(newLeft, newRight, Inner, Some(And(eq, cond)), hint))
      }
  }

  /** Fire only where the planner would otherwise nest-loop: an inner
    * join with no equi-conjunct between the sides. */
  private def eligible(j: Join, cond: Expression): Boolean =
    !conjuncts(cond).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
          (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
      case _ => false
    }
}

/** Optimizer rule: rewrite a pure ABS-BAND join
  *
  * {{{ a JOIN b ON abs(a.v - b.v) <= W }}}
  *
  * into a 3-bucket equi-join — the symmetric sibling of
  * [[RewriteIdWindowRangeJoin]] and the natural naive spelling of
  * entity-resolution BLOCKING (q274's length band, numeric-tolerance
  * record linkage, timestamp-tolerance matching). Spark nest-loops the
  * bare inequality; but |a − b| ≤ W pins `b div W` inside
  * `{a div W − 1, a div W, a div W + 1}`: truncating division is
  * monotone with step points only at multiples of W, so
  * div(x+W) ≤ div(x)+1 and (applying that at x−W) div(x−W) ≥
  * div(x)−1 — over ALL integers, negatives included (property-tested
  * across the sign boundary in RangeJoinRuleSpec). The left side
  * explodes into the three buckets, the right side computes one, the
  * bucket equality drives a hash/sort-merge join, and the original
  * band predicate still filters exactly — results identical.
  *
  * Fires only on Inner joins with NO equi-conjunct whose condition
  * carries `abs(x − y) <= literal` on integral attributes from
  * opposite sides. */
object RewriteAbsBandRangeJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private object WindowLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  private object AbsDiff {
    def unapply(e: Expression): Option[(AttributeReference, AttributeReference)] =
      e match {
        case Abs(Subtract(x: AttributeReference, y: AttributeReference, _), _) =>
          Some((x, y))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j, cond) =>
      val cs = conjuncts(cond)
      val bands = cs.collect {
        case LessThanOrEqual(AbsDiff(x, y), WindowLiteral(w)) => (x, y, w)
        case GreaterThanOrEqual(WindowLiteral(w), AbsDiff(x, y)) => (x, y, w)
        case LessThan(AbsDiff(x, y), WindowLiteral(w)) if w > 1 => (x, y, w - 1)
      }
      val pair = bands.collectFirst {
        case (x, y, w)
            if w > 0 && integral(x) && integral(y) &&
              ((left.outputSet.contains(x) && right.outputSet.contains(y)) ||
                (left.outputSet.contains(y) && right.outputSet.contains(x))) =>
          // orient so `l` is the LEFT side's attribute
          if (left.outputSet.contains(x)) (x, y, w) else (y, x, w)
      }
      pair match {
        case None => j
        case Some((l, r, w)) =>
          val width = Literal(w, LongType)
          val divL = IntegralDivide(Cast(l, LongType), width)
          val bucketL = AttributeReference("__graft_ab_bucket", LongType,
            nullable = divL.nullable)()
          val gen = Generate(
            Explode(CreateArray(Seq(
              Subtract(divL, Literal(1L)), divL, Add(divL, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketL), child = left)
          val rAlias = Alias(IntegralDivide(Cast(r, LongType), width),
            "__graft_ab_bucket_r")()
          val projR = Project(right.output :+ rAlias, right)
          val eq = EqualTo(bucketL, rAlias.toAttribute)
          Project(j.output,
            Join(gen, projR, Inner, Some(And(eq, cond)), hint))
      }
  }

  private def eligible(j: Join, cond: Expression): Boolean =
    !conjuncts(cond).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
          (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
      case _ => false
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the
  * engine's optimizer rules into a session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteIdWindowRangeJoin)
    ext.injectOptimizerRule(_ => RewriteAbsBandRangeJoin)
  }
}
