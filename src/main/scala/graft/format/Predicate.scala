package graft.format

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Predicate language for Graft table scans.
  *
  * Each predicate plays two roles:
  *   1. compiled to a Spark `Column` applied to the scan DataFrame (exact,
  *      executor-side — Catalyst additionally pushes it into the parquet
  *      reader for row-group pruning, reference docs/09-query-performance.md:46-55), and
  *   2. evaluated driver-side against manifest partition tuples and per-file
  *      min/max/null-count stats for phase-1/phase-2 pruning
  *      (docs/09:17-44, docs/03:111-133).
  *
  * Pruning is *advisory and sound*: `mayMatch` may return true for a file
  * with no matching rows (include it — correctness unaffected), but must
  * never return false for a file that has matching rows.
  */
sealed trait Predicate {
  def toColumn: Column
  def references: Set[String]
}

object Predicate {
  sealed trait Leaf extends Predicate { def col: String; def references = Set(col) }

  case class Eq(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) === lit(value)
  }
  case class NotEq(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) =!= lit(value)
  }
  case class Lt(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) < lit(value)
  }
  case class LtEq(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) <= lit(value)
  }
  case class Gt(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) > lit(value)
  }
  case class GtEq(col: String, value: Any) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) >= lit(value)
  }
  case class In(col: String, values: Seq[Any]) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).isin(values: _*)
  }
  case class IsNull(col: String) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).isNull
  }
  case class NotNull(col: String) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).isNotNull
  }
  case class StartsWith(col: String, prefix: String) extends Leaf {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).startsWith(prefix)
  }
  case class And(left: Predicate, right: Predicate) extends Predicate {
    def toColumn: Column = left.toColumn && right.toColumn
    def references = left.references ++ right.references
  }
  case class Or(left: Predicate, right: Predicate) extends Predicate {
    def toColumn: Column = left.toColumn || right.toColumn
    def references = left.references ++ right.references
  }
  case object True extends Predicate {
    def toColumn: Column = lit(true)
    def references = Set.empty
  }

  def all(ps: Seq[Predicate]): Predicate = ps.reduceOption(And(_, _)).getOrElse(True)

  // ---------------------------------------------------------------------
  // Driver-side pruning
  // ---------------------------------------------------------------------

  /** Per-column interval + null info available to the pruner (from a file's
    * manifest stats or from a manifest's partition summaries).
    */
  case class Bounds(lower: Option[Any], upper: Option[Any],
                    nullCount: Option[Long], recordCount: Option[Long]) {
    def allNull: Boolean =
      (nullCount, recordCount) match {
        case (Some(n), Some(r)) => n == r && r > 0
        case _ => false
      }
    def mayHaveNull: Boolean = nullCount.forall(_ > 0)
  }

  /** Environment the pruner sees for one candidate file (phase 2) or one
    * manifest (phase 1):
    *   - `statBounds`: per source-column min/max/null-count in that column's
    *     canonical space (file-level column stats, docs/03:111-133)
    *   - `transformedBounds`: for each partition field derived from the
    *     column, the transform plus bounds in *transform output space* — a
    *     point interval for a file's partition tuple, a range for a
    *     manifest's partition summary (docs/03:137-150)
    */
  case class PruneContext(
      schema: StructType,
      statBounds: String => Option[Bounds],
      transformedBounds: String => Seq[(Transform, Bounds)],
      /** Equality-probe bloom test (file granularity only): "may this file
        * contain `value` in `col`?" Defaults to "maybe" — manifests and
        * bloom-less files never prune on it. See [[graft.io.Bloom]]. */
      bloomMayContain: (String, DataType, Any) => Boolean = (_, _, _) => true)

  /** Sound "may contain matching rows" test (file or manifest granularity). */
  def mayMatch(p: Predicate, ctx: PruneContext): Boolean = p match {
    case And(l, r) => mayMatch(l, ctx) && mayMatch(r, ctx)
    case Or(l, r) => mayMatch(l, ctx) || mayMatch(r, ctx)
    case True => true
    case leaf: Leaf =>
      val dt = ctx.schema.fields.find(_.name == leaf.col).map(_.dataType)
      dt match {
        case None => true // unknown column: be conservative
        case Some(t) =>
          val statsOk = ctx.statBounds(leaf.col).forall(b => leafMayMatchBounds(leaf, t, b))
          val partsOk = ctx.transformedBounds(leaf.col).forall { case (tr, b) =>
            leafMayMatchViaTransform(leaf, t, tr, b)
          }
          val bloomOk = leaf match {
            case Eq(c, v) if v != null => ctx.bloomMayContain(c, t, v)
            case In(c, vs) => vs.exists(v => v == null || ctx.bloomMayContain(c, t, v))
            case _ => true
          }
          statsOk && partsOk && bloomOk
      }
  }

  /** Hidden-partition derivation (docs/07-partitioning.md:30-40): rewrite a
    * leaf on the *source* column into transform output space, then interval-
    * check it against partition bounds. For monotonic transforms a strict
    * bound weakens to non-strict (x < v admits any file whose partition value
    * is <= t(v)); identity keeps the leaf exact; bucket admits only
    * equality-shaped derivation.
    */
  private def leafMayMatchViaTransform(leaf: Leaf, srcDt: DataType, tr: Transform,
                                       b: Bounds): Boolean = {
    if (tr == Transform.Identity) return leafMayMatchBounds(leaf, srcDt, b)
    val outDt = tr.resultType(srcDt)
    def derive(raw: Any): Option[Any] = Canonical.of(srcDt, raw).flatMap(c => tr(srcDt, c))
    leaf match {
      case IsNull(_) => b.mayHaveNull
      case NotNull(_) => !b.allNull
      case Eq(c, raw) => derive(raw) match {
        case None => true
        case Some(v) => leafMayMatchBounds(Eq(c, v), outDt, b)
      }
      case In(c, raws) =>
        val ds = raws.map(derive)
        if (ds.exists(_.isEmpty)) true
        else leafMayMatchBounds(In(c, ds.flatten), outDt, b)
      case Lt(c, raw) if tr.monotonic => derive(raw) match {
        case None => true
        case Some(v) => leafMayMatchBounds(LtEq(c, v), outDt, b)
      }
      case LtEq(c, raw) if tr.monotonic => derive(raw) match {
        case None => true
        case Some(v) => leafMayMatchBounds(LtEq(c, v), outDt, b)
      }
      case Gt(c, raw) if tr.monotonic => derive(raw) match {
        case None => true
        case Some(v) => leafMayMatchBounds(GtEq(c, v), outDt, b)
      }
      case GtEq(c, raw) if tr.monotonic => derive(raw) match {
        case None => true
        case Some(v) => leafMayMatchBounds(GtEq(c, v), outDt, b)
      }
      case StartsWith(c, prefix) => tr match {
        case Transform.Truncate(w) =>
          leafMayMatchBounds(StartsWith(c, Transform.takeCodePoints(prefix, w)), outDt, b)
        case _ => true
      }
      case _ => true // NotEq through a non-identity transform: cannot prune
    }
  }

  private def leafMayMatchBounds(leaf: Leaf, dt: DataType, b: Bounds): Boolean = {
    def cmpLo(v: Any): Option[Int] = b.lower.map(lo => Canonical.compare(lo, v))
    def cmpHi(v: Any): Option[Int] = b.upper.map(hi => Canonical.compare(hi, v))
    def canon(raw: Any): Option[Any] = Canonical.of(dt, raw)
    leaf match {
      case IsNull(_) => b.mayHaveNull
      case NotNull(_) => !b.allNull
      case _ if b.allNull => false // value comparisons never match an all-null column
      case Eq(_, raw) => canon(raw) match {
        case None => true
        case Some(v) => cmpLo(v).forall(_ <= 0) && cmpHi(v).forall(_ >= 0)
      }
      case NotEq(_, raw) => canon(raw) match {
        case None => true
        // only prunable when the file is constant at exactly v
        case Some(v) => !(cmpLo(v).contains(0) && cmpHi(v).contains(0) && !b.mayHaveNull)
      }
      case Lt(_, raw) => canon(raw) match {
        case None => true; case Some(v) => cmpLo(v).forall(_ < 0)
      }
      case LtEq(_, raw) => canon(raw) match {
        case None => true; case Some(v) => cmpLo(v).forall(_ <= 0)
      }
      case Gt(_, raw) => canon(raw) match {
        case None => true; case Some(v) => cmpHi(v).forall(_ > 0)
      }
      case GtEq(_, raw) => canon(raw) match {
        case None => true; case Some(v) => cmpHi(v).forall(_ >= 0)
      }
      case In(_, raws) =>
        val vs = raws.map(canon)
        if (vs.exists(_.isEmpty)) true
        else vs.flatten.exists(v => cmpLo(v).forall(_ <= 0) && cmpHi(v).forall(_ >= 0))
      case StartsWith(_, prefix) =>
        // lower <= prefix-extended-max and upper >= prefix (UTF-8 byte order,
        // the order the bounds were computed in — see Canonical.compare)
        val loOk = b.lower.forall(lo =>
          Canonical.compare(lo.asInstanceOf[String].take(prefix.length), prefix) <= 0)
        val hiOk = b.upper.forall(hi => Canonical.compare(hi, prefix) >= 0)
        loOk && hiOk
    }
  }

}
