package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the partition-pruning evaluation logic
  * ([[Partitions.matches]]'s five-state machine) against a brute-force
  * SQL three-valued reference:
  *
  *   - SOUNDNESS (the safety property): if ANY row extension of the
  *     file's constant partition values could satisfy the filter, the
  *     file must be kept. Pruning a file with a satisfying row silently
  *     drops result rows — the exact bug class the NeverTrue state fixed
  *     (Not over And(Unknown, PerRow)).
  *   - PRECISION on partition-only filters: with no per-row references,
  *     evaluation is total, so exclusion must EXACTLY equal 3VL
  *     non-TRUE — conservatism there would just be lost pruning.
  *
  * Cases come from a fixed-seed generator (seeded randomness in the
  * engine is banned; deterministic test-case generation is fine). */
class PartitionsLogicSpec extends AnyFunSuite {

  // literal + row-value domain: null, boundary longs around the generated
  // comparison points
  private val domain: Seq[Any] = Seq(null, 0L, 1L, 6L, 10L)

  /** Brute-force SQL 3VL evaluation over a TOTAL row assignment:
    * Some(bool) or None = UNKNOWN. The reference semantics. */
  private def eval(f: Filter, row: Map[String, Any]): Option[Boolean] = {
    def cmp(c: String, v: Any): Option[Int] = {
      val x = row(c)
      if (x == null || v == null) None
      else Some(java.lang.Long.compare(
        x.asInstanceOf[Long], v.asInstanceOf[Long]))
    }
    f match {
      case EqualTo(c, v) => cmp(c, v).map(_ == 0)
      case GreaterThan(c, v) => cmp(c, v).map(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v).map(_ >= 0)
      case LessThan(c, v) => cmp(c, v).map(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v).map(_ <= 0)
      case In(c, vs) =>
        val rs = vs.toSeq.map(v => cmp(c, v).map(_ == 0))
        if (rs.exists(_.contains(true))) Some(true)
        else if (rs.exists(_.isEmpty)) None
        else Some(false)
      case IsNull(c) => Some(row(c) == null)
      case IsNotNull(c) => Some(row(c) != null)
      case And(l, r) => (eval(l, row), eval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l, row), eval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(c, row).map(!_)
      case _ => Some(true)
    }
  }

  private def genFilter(
      rnd: scala.util.Random, depth: Int, cols: IndexedSeq[String]): Filter = {
    def col() = cols(rnd.nextInt(cols.length))
    def lit(): Any = domain(rnd.nextInt(domain.length))
    if (depth == 0 || rnd.nextInt(3) == 0) {
      rnd.nextInt(8) match {
        case 0 => EqualTo(col(), lit())
        case 1 => GreaterThan(col(), lit())
        case 2 => GreaterThanOrEqual(col(), lit())
        case 3 => LessThan(col(), lit())
        case 4 => LessThanOrEqual(col(), lit())
        case 5 => In(col(), Array(lit(), lit()))
        case 6 => IsNull(col())
        case _ => IsNotNull(col())
      }
    } else rnd.nextInt(3) match {
      case 0 => And(genFilter(rnd, depth - 1, cols), genFilter(rnd, depth - 1, cols))
      case 1 => Or(genFilter(rnd, depth - 1, cols), genFilter(rnd, depth - 1, cols))
      case _ => Not(genFilter(rnd, depth - 1, cols))
    }
  }

  test("soundness: a file with a possibly-TRUE row is never excluded (5000 random filters)") {
    val rnd = new scala.util.Random(7)
    var satisfiableCases = 0
    (0 until 5000).foreach { _ =>
      val f = genFilter(rnd, 3, IndexedSeq("p", "d")) // p = partition, d = data
      val pVal = domain(rnd.nextInt(domain.length))
      val vals: Map[String, Any] = Map("p" -> pVal)
      // exists a data-row value making the filter TRUE?
      val satisfiable = domain.exists(dv =>
        eval(f, Map("p" -> pVal, "d" -> dv)).contains(true))
      if (satisfiable) {
        satisfiableCases += 1
        assert(Partitions.matches(f, vals),
          s"UNSOUND PRUNE: $f with p=$pVal has a satisfying row but was excluded")
      }
    }
    assert(satisfiableCases > 1000,
      s"generator sanity: only $satisfiableCases satisfiable cases exercised")
  }

  test("row-group stats pruning soundness: a batch with a satisfying row is never excluded") {
    // same safety property one layer down: [[BatchSource.excludes]]
    // prunes row groups from footer (min, max, nullCount) stats — if any
    // generated row satisfies the filter, exclusion loses result rows
    val rnd = new scala.util.Random(21)
    var exercised = 0
    (0 until 5000).foreach { _ =>
      val nRows = 1 + rnd.nextInt(6)
      val cols = Seq("p", "d")
      val batch: Seq[Map[String, Any]] = (0 until nRows).map { _ =>
        cols.map(c => c -> domain(rnd.nextInt(domain.length))).toMap
      }
      // exact footer stats; an all-null column carries no min/max in a
      // real footer, so it is simply absent (excludes keeps, conservative)
      val stats: BatchSource.ColStats = cols.flatMap { c =>
        val vs = batch.map(_(c))
        val nonNull = vs.filter(_ != null).map(_.asInstanceOf[Long])
        if (nonNull.isEmpty) None
        else Some(c ->
          ((nonNull.min: Any, nonNull.max: Any, vs.count(_ == null).toLong)))
      }.toMap
      val f = genFilter(rnd, 3, IndexedSeq("p", "d"))
      if (batch.exists(row => eval(f, row).contains(true))) {
        exercised += 1
        assert(!BatchSource.excludes(f, stats, nRows),
          s"UNSOUND ROW-GROUP PRUNE: $f excluded a batch containing a " +
            s"satisfying row; stats=$stats batch=$batch")
      }
    }
    assert(exercised > 1000, s"generator sanity: only $exercised satisfiable cases")
  }

  test("precision: partition-only filters exclude exactly the 3VL non-TRUE files") {
    val rnd = new scala.util.Random(13)
    var excluded = 0
    (0 until 5000).foreach { _ =>
      val f = genFilter(rnd, 3, IndexedSeq("p"))
      val pVal = domain(rnd.nextInt(domain.length))
      val truth = eval(f, Map("p" -> pVal)).contains(true)
      val kept = Partitions.matches(f, Map("p" -> pVal))
      assert(kept == truth,
        s"$f with p=$pVal: matches=$kept but exact 3VL truth is $truth")
      if (!kept) excluded += 1
    }
    assert(excluded > 500, s"generator sanity: only $excluded exclusions exercised")
  }
}
