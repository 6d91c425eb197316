package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Derived-time predicate pushdown.
  *
  * The engine's event-time discipline keeps a raw nanosecond long as the
  * canonical value and derives every coarser image explicitly
  * (`unix_micros(ts) * 1000`, `... div 1000`, `... div 1000000000` — see
  * Tables.normalizeEventTime and hedera.Deduplication). That is the
  * reference's own discipline (TransactionJsonToTableRow.java:57-58), but it
  * has a scan-level cost Spark cannot recover on its own: a predicate on the
  * derived value is an opaque function of the underlying timestamp column,
  * so the parquet reader receives NO filter and every row group in a 100 TB
  * scan is read and decoded just to evaluate a time window.
  *
  * This rule closes that gap algebraically. Each monotone derivation chain
  *
  *   chain := unix_micros(rawTs | cast(rawTs_ntz as timestamp) [UTC])
  *            (· * posConst | · div posConst)*
  *
  * compared against an integer literal is inverted exactly — `div` is
  * Spark's IntegralDivide (truncation toward zero), inverted with the
  * truncation-correct bounds, multiplication with true ceil/floor — into an
  * equivalent closed interval on the RAW timestamp column, which is added as
  * a REDUNDANT conjunct. The original predicate stays (bit-for-bit result
  * compatibility, including null semantics: both forms null out together);
  * the new simple comparison is exactly what the parquet data source can
  * push, so row-group statistics prune the scan. `.explain` shows the win:
  * `PushedFilters: [..., GreaterThanOrEqual(ts,...)]` on scans that
  * previously pushed nothing.
  *
  * Bounds are computed in BigInt and clamped: an inverted bound past the
  * Long range degrades to "no bound on that side", never to a wrong bound.
  * The NTZ→LTZ cast form is only inverted when the cast's zone is UTC
  * (GraftSession pins the session zone to UTC); under any other zone the
  * wall-clock mapping is not the identity and the rule leaves the filter
  * untouched.
  *
  * Registered by GraftExtensions as an operator-optimization rule; it runs
  * inside the fixed-point batch AFTER alias inlining has pushed the filter
  * against the relation, and it is convergent: a conjunct it already added
  * (checked by semanticEquals) is never added again.
  */
object DerivedTimeFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val UtcIds = Set("UTC", "Etc/UTC", "GMT", "Z", "+00:00")

  private sealed trait Step
  private final case class Div(d: Long) extends Step
  private final case class Mul(m: Long) extends Step

  /** Inclusive interval, None = unbounded on that side. */
  private final case class B(lo: Option[BigInt], hi: Option[BigInt])

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case _ => None
    }
  }

  private def posLit(e: Expression): Option[Long] = e match {
    case IntLit(v) if v > 0 => Some(v)
    case _ => None
  }

  /** chain(e) = steps (outermost first) over the raw attribute's integer
    * image: `unix_micros(tsCol)` for timestamp columns (the engine's µs
    * image), or the column value itself for a bare LONG column (the ns-long
    * discipline — the same chains appear as `ts div 1000` over a long).
    * A bare-long base requires at least one arithmetic step: a plain
    * `longCol >= lit` is already pushdown-eligible as written. */
  private def parse(e: Expression): Option[(AttributeReference, List[Step])] = e match {
    case d: IntegralDivide =>
      for { dd <- posLit(d.right); (a, s) <- parseInner(d.left) } yield (a, Div(dd) :: s)
    case m: Multiply =>
      val inner = posLit(m.right).map(v => (m.left, v))
        .orElse(posLit(m.left).map(v => (m.right, v)))
      for { (in, mm) <- inner; (a, s) <- parseInner(in) } yield (a, Mul(mm) :: s)
    case u: UnixMicros => microsBase(u)
    case _ => None
  }

  private def parseInner(e: Expression): Option[(AttributeReference, List[Step])] = e match {
    case a: AttributeReference if a.dataType == LongType => Some((a, Nil))
    case other => parse(other)
  }

  private def microsBase(u: UnixMicros): Option[(AttributeReference, List[Step])] =
    u.child match {
      case a: AttributeReference if a.dataType == TimestampType => Some((a, Nil))
      case c: Cast
          if c.dataType == TimestampType &&
            c.child.dataType == TimestampNTZType &&
            UtcIds.contains(c.timeZoneId.getOrElse(conf.sessionLocalTimeZone)) =>
        c.child match {
          case a: AttributeReference => Some((a, Nil))
          case _ => None
        }
      case _ => None
    }

  private def floorDiv(a: BigInt, d: BigInt): BigInt = {
    val q = a / d
    if (a % d != 0 && a.signum * d.signum < 0) q - 1 else q
  }
  private def ceilDiv(a: BigInt, d: BigInt): BigInt = -floorDiv(-a, d)

  /** Un-apply the chain (outermost first), exact in BigInt. */
  private def invert(steps: List[Step], b: B): B = steps match {
    case Nil => b
    case Div(d) :: rest =>
      // value = quot(inner, d), d > 0, truncation toward zero:
      //   value >= a ⟺ inner >= (if a >= 1) a·d else (a-1)·d + 1
      //   value <= b ⟺ inner <= (if b <= -1) b·d else (b+1)·d - 1
      val dd = BigInt(d)
      invert(rest, B(
        b.lo.map(a => if (a >= 1) a * dd else (a - 1) * dd + 1),
        b.hi.map(x => if (x <= -1) x * dd else (x + 1) * dd - 1)))
    case Mul(m) :: rest =>
      // value = inner · m, m > 0: value >= a ⟺ inner >= ceil(a/m), etc.
      val mm = BigInt(m)
      invert(rest, B(b.lo.map(ceilDiv(_, mm)), b.hi.map(floorDiv(_, mm))))
  }

  /** Comparison conjunct → interval on the chain's output value. */
  private def boundsOf(c: Expression): Option[(AttributeReference, List[Step], B)] = {
    def p(e: Expression, b: B) = parse(e).map { case (a, s) => (a, s, b) }
    c match {
      case GreaterThanOrEqual(e, IntLit(v)) => p(e, B(Some(BigInt(v)), None))
      case GreaterThan(e, IntLit(v)) => p(e, B(Some(BigInt(v) + 1), None))
      case LessThanOrEqual(e, IntLit(v)) => p(e, B(None, Some(BigInt(v))))
      case LessThan(e, IntLit(v)) => p(e, B(None, Some(BigInt(v) - 1)))
      case EqualTo(e, IntLit(v)) => p(e, B(Some(BigInt(v)), Some(BigInt(v))))
      case GreaterThanOrEqual(IntLit(v), e) => p(e, B(None, Some(BigInt(v))))
      case GreaterThan(IntLit(v), e) => p(e, B(None, Some(BigInt(v) - 1)))
      case LessThanOrEqual(IntLit(v), e) => p(e, B(Some(BigInt(v)), None))
      case LessThan(IntLit(v), e) => p(e, B(Some(BigInt(v) + 1), None))
      case EqualTo(IntLit(v), e) => p(e, B(Some(BigInt(v)), Some(BigInt(v))))
      case _ => None
    }
  }

  private val MinUs = BigInt(Long.MinValue)
  private val MaxUs = BigInt(Long.MaxValue)

  /** Raw-column predicates equivalent to (implied by) one derived conjunct. */
  private def rawPredicates(c: Expression): Seq[Expression] =
    boundsOf(c).toSeq.flatMap { case (attr, steps, b0) =>
      val us = invert(steps, b0)
      def lit(v: BigInt) = Literal(v.toLong, attr.dataType)
      val lo = us.lo.collect {
        // a bound past the Long range degrades to unbounded (never wrong)
        case a if a > MinUs && a <= MaxUs => GreaterThanOrEqual(attr, lit(a))
      }
      val hi = us.hi.collect {
        case x if x >= MinUs && x < MaxUs => LessThanOrEqual(attr, lit(x))
      }
      lo.toSeq ++ hi.toSeq
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(rawPredicates)
        .foldLeft(Vector.empty[Expression]) { (acc, p) =>
          if (acc.exists(_.semanticEquals(p)) || conjuncts.exists(_.semanticEquals(p))) acc
          else acc :+ p
        }
      if (extras.isEmpty) f
      else Filter((conjuncts ++ extras).reduce(And), child)
  }
}
