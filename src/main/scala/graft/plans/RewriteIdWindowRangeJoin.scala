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

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the
  * engine's optimizer rules into a session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteIdWindowRangeJoin)
}
