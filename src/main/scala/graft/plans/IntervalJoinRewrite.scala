package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule (SURVEY.md §4's "interval join planning rule",
  * realized at the plan level): an inner join whose condition contains a
  * two-sided containment `ts >= start AND ts < end` — the reference's
  * metrics ⋈ accounting shape, and the general range join — OR its
  * inclusive-upper variant `ts >= start AND ts <= end` (the reference
  * step-3.1 semantics, `step-3.1/old/consumer_2.py:388,426`, and what a
  * SQL `BETWEEN` desugars to) is rewritten into the bucketed equi-join
  * form of
  * [[graft.operators.IntervalJoin.bucketed]]: the interval side explodes
  * into the fixed-width time buckets it overlaps (a `Generate` node), the
  * probe side computes its single bucket, and `bucket = bucket` joins the
  * equi-key set. The original containment conjuncts remain as the residual
  * filter, so results are row-identical to the un-rewritten join.
  *
  * Why: Catalyst extracts any `key = key` conjunct and hash-joins on it,
  * but every row of a key still meets EVERY interval of that key (per-key
  * all-pairs); with no equi conjunct at all the planner falls back to a
  * broadcast-nested-loop or cartesian product. Bucketing bounds the blowup
  * to intervals overlapping the row's own bucket — the difference between
  * a 100 TB range join finishing and not.
  *
  * Scope guards (each bail keeps the original join):
  *  - inner joins, plus LEFT SEMI / LEFT ANTI (EXISTS / NOT EXISTS range
  *    predicates) when the interval side is the RIGHT side — existence
  *    tests are multiplicity-blind to the exploded side, but exploding
  *    the preserved left would corrupt the output; no user join hint (an
  *    explicit `broadcast()` is respected — that plan is already optimal);
  *  - `ts`/`start`/`end` are plain timestamp attributes, `ts` from one
  *    side, both bounds from the other; TIMESTAMP_NTZ (the type parquet
  *    `isAdjustedToUTC=false` reads as) qualifies only under a
  *    fixed-offset session timezone — wall-clock bucketing is
  *    DST-ambiguous, see `IntervalJoin.bucketed`;
  *  - conditions already referencing a `__`-prefixed attribute are skipped
  *    (prevents re-bucketing this rule's own output or the explicit
  *    bucketed operator's).
  *
  * `spark.graft.rewrite.intervalJoin` (default true) gates the rule;
  * `spark.graft.rewrite.intervalJoin.bucketMicros` (default 1 day) sets
  * the bucket width — size it at or above the typical interval length:
  * each interval emits one row per overlapped bucket, so width ≪ interval
  * trades join fan-in for explode fan-out.
  * `spark.graft.rewrite.intervalJoin.smallSideBytes` (default −1 = off):
  * when ≥ 0, the rule bails if the interval side's estimated plan size is
  * at or under that many bytes — a side small enough to broadcast is
  * served optimally by the hash/BNLJ plan Catalyst already picks, and
  * skipping it also sidesteps explode fan-out from open-ended sentinel
  * intervals, which tend to live in small dimension tables (set it to
  * `spark.sql.autoBroadcastJoinThreshold` for symmetric behavior). Every
  * fired rewrite is `logInfo`'d with the interval side's size estimate so
  * runaway fan-out is attributable to the rule. */
case class IntervalJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import IntervalJoinRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!session.conf.get(EnabledKey, "true").toBoolean) plan
    else plan.transformUp {
      // Inner joins, plus LEFT SEMI/ANTI (EXISTS / NOT EXISTS range
      // predicates): semi/anti only test MATCH EXISTENCE against the right
      // side, so exploding the right into buckets cannot change the
      // output — but only when the interval side IS the right side
      // (exploding the preserved left would duplicate/drop result rows);
      // `rewrite` enforces that orientation per join type.
      case j @ Join(_, _, Inner | LeftSemi | LeftAnti, Some(cond), hint)
          if hint == JoinHint.NONE &&
            !cond.references.exists(_.name.startsWith("__")) =>
        rewrite(j).getOrElse(j)
    }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def sideOf(a: Attribute): Option[Boolean] = // Some(true) = left side
      if (j.left.outputSet.contains(a)) Some(true)
      else if (j.right.outputSet.contains(a)) Some(false) else None

    // Normalize range conjuncts to (ts, bound, kind) candidates. A `<=`
    // between two plain attributes is AMBIGUOUS in isolation — `a <= b` is
    // both "a lower-bounds ts=b" and "ts=a upper-bounds at b inclusive" —
    // so both readings are emitted and the pairing step below disambiguates
    // (the ts attribute must be the SAME in the lower and upper conjunct,
    // and both bounds must come from the side opposite it).
    def asBounds(e: Expression): Seq[(Attribute, Attribute, Int)] = e match {
      case GreaterThanOrEqual(a: Attribute, b: Attribute) =>
        Seq((a, b, KLower), (b, a, KUpperIncl))
      case LessThanOrEqual(a: Attribute, b: Attribute) =>
        Seq((b, a, KLower), (a, b, KUpperIncl))
      case LessThan(t: Attribute, e2: Attribute) => Seq((t, e2, KUpperExcl))
      case GreaterThan(e2: Attribute, t: Attribute) => Seq((t, e2, KUpperExcl))
      case _ => Nil
    }
    // TIMESTAMP always qualifies; TIMESTAMP_NTZ (what parquet with
    // isAdjustedToUTC=false reads as) only under a fixed-offset session
    // timezone — wall-clock bucketing is ambiguous across DST gaps (same
    // contract as IntervalJoin.bucketed, which REQUIREs; a silent planning
    // rule must bail instead)
    val tzFixed = java.time.ZoneId
      .of(session.sessionState.conf.sessionLocalTimeZone).getRules.isFixedOffset
    def bucketable(a: Attribute): Boolean = a.dataType match {
      case TimestampType => true
      case TimestampNTZType => tzFixed
      case _ => false
    }
    val bounds = conjuncts.flatMap(asBounds).filter { case (t, b, _) =>
      bucketable(t) && bucketable(b) &&
        sideOf(t).isDefined && sideOf(b).isDefined && sideOf(t) != sideOf(b)
    }
    val containment = (for {
      (t1, start, KLower) <- bounds
      (t2, end, ku) <- bounds
      if ku != KLower
      if t1.semanticEquals(t2) && sideOf(start) == sideOf(end)
      // semi/anti preserve the left side as-is: the exploded interval side
      // must be the right (ts on the left); inner accepts either
      if j.joinType == Inner || sideOf(t1).contains(true)
    } yield (t1, start, end, ku == KUpperIncl)).headOption

    containment.flatMap { case (ts, start, end, inclusive) =>
      val w = session.conf
        .get(BucketMicrosKey, DefaultBucketMicros.toString).toLong
      require(w > 0, s"$BucketMicrosKey must be positive, got $w")
      // floor over double division: exact below 2^53 µs (~year 2255) and
      // floor (not truncate-toward-zero) for pre-epoch timestamps —
      // bit-matches IntervalJoin.bucketed's bucket assignment (including
      // the NTZ→TIMESTAMP cast applied to BOTH sides, so bucket
      // assignment stays consistent)
      def micros(e: Expression): Expression = e.dataType match {
        case TimestampType => UnixMicros(e)
        case _ => UnixMicros(Cast(e, TimestampType))
      }
      def bucketOf(e: Expression): Expression =
        Cast(Floor(Divide(Cast(micros(e), DoubleType),
          Literal(w.toDouble))), LongType)
      // exclusive `[start, end)`: the last covered instant is end−1µs;
      // inclusive `[start, end]`: end itself is covered, so no −1
      val lastBucket =
        if (inclusive) bucketOf(end)
        else Cast(Floor(Divide(
          Cast(Subtract(micros(end), Literal(1L)), DoubleType),
          Literal(w.toDouble))), LongType)
      // this rule runs post-analysis, so ResolveTimeZone has already
      // passed: timezone-aware expressions built HERE must be bound
      // explicitly or the plan flips back to unresolved
      def withTz(e: Expression): Expression = e.transformUp {
        case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
          t.withTimeZone(session.sessionState.conf.sessionLocalTimeZone)
      }
      // explicit step 1: Sequence's auto-step would count DOWN for an
      // inverted (start >= end) interval instead of yielding no buckets —
      // and with the explicit step it THROWS on inverted boundaries, so
      // degenerate/NULL intervals route to an empty bucket list instead
      // (the original join yields nothing for them; the rewrite must too).
      // Inclusive bounds admit the point interval start == end (one
      // bucket); the original join matches ts == start there, so must we.
      val seq = Sequence(bucketOf(start), lastBucket, Some(Literal(1L)))
      val emptyBuckets = Literal.create(Seq.empty[Long], seq.dataType)
      val nonDegenerate =
        if (inclusive) LessThanOrEqual(start, end) else LessThan(start, end)
      val explode = Explode(withTz(If(nonDegenerate, seq, emptyBuckets)))
      val elem = explode.elementSchema.fields.head
      val bucketAttr = AttributeReference("__graft_bucket", elem.dataType,
        elem.nullable)()
      val tsOnLeft = sideOf(ts).contains(true)
      val intervalSide = if (tsOnLeft) j.right else j.left
      // opt-in small-side bail: a broadcastable interval side is already
      // served optimally by the plan Catalyst picks without us, and the
      // explode fan-out (one row per covered bucket) buys nothing there
      val smallSide = session.conf.get(SmallSideBytesKey, "-1").toLong
      if (smallSide >= 0 && intervalSide.stats.sizeInBytes <= smallSide) {
        logInfo(s"IntervalJoinRewrite: NOT rewriting — interval side " +
          s"estimated at ${intervalSide.stats.sizeInBytes} bytes <= " +
          s"$SmallSideBytesKey=$smallSide")
        None
      } else {
        logInfo(s"IntervalJoinRewrite: bucketing ${if (inclusive) "[start, end]"
          else "[start, end)"} containment on '${ts.name}' (bucket ${w}µs, " +
          s"interval side estimated at ${intervalSide.stats.sizeInBytes} bytes)")
        val gen = Generate(explode, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bucketAttr), child = intervalSide)
        val newCond = And(j.condition.get,
          EqualTo(withTz(bucketOf(ts)), bucketAttr))
        val newJoin =
          if (tsOnLeft) Join(j.left, gen, j.joinType, Some(newCond), j.hint)
          else Join(gen, j.right, j.joinType, Some(newCond), j.hint)
        // restore the original output (order and no __graft_bucket)
        Some(Project(j.output, newJoin))
      }
    }
  }
}

object IntervalJoinRewrite {
  val EnabledKey = "spark.graft.rewrite.intervalJoin"
  val BucketMicrosKey = "spark.graft.rewrite.intervalJoin.bucketMicros"
  val SmallSideBytesKey = "spark.graft.rewrite.intervalJoin.smallSideBytes"
  val DefaultBucketMicros: Long = 24L * 3600L * 1000000L

  // bound-candidate kinds for the containment extraction
  private[plans] final val KLower = 0
  private[plans] final val KUpperExcl = 1
  private[plans] final val KUpperIncl = 2
}
