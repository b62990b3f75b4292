package graft.analysis

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence pattern matching — ClickHouse `sequenceMatch` /
  * `sequenceCount` semantics (parametric-functions docs; the function
  * family of the reference's storage engine, sibling of windowFunnel).
  *
  * The pattern is a regex over the per-key sequence of CONSIDERED
  * events — rows where at least one condition holds; rows matching no
  * condition are skipped entirely (the ClickHouse rule, and what bounds
  * the per-key state to a key's own condition events). Supported
  * elements:
  *
  *   - `(?N)`       the N-th condition (1-based) holds on this event
  *   - `.`          exactly one considered event, any condition
  *   - `.*`         any number of considered events
  *   - `(?t OP v)`  time guard immediately before a `(?N)`: the matched
  *                  event's ts minus the PREVIOUS matched condition
  *                  event's ts satisfies `OP v` (OP ∈ <, <=, >, >=, ==)
  *
  * Matching is unanchored (ClickHouse checks containment). Adjacency is
  * meaningful: `(?1)(?2)` requires the cond-2 event to be the very next
  * considered event after the cond-1 event; `(?1).*(?2)` allows any gap.
  * Events at equal timestamps order by their condition bitmask (a
  * deterministic stand-in for ClickHouse's "undefined order within one
  * second").
  *
  * `sequenceCount` counts NON-OVERLAPPING matches left to right: the
  * next search resumes after the end of the previous match (ClickHouse's
  * documented greedy rule), which the implementation realizes by always
  * taking the match with the minimal end position.
  *
  * Plan shape: one hash shuffle groups each key's condition events into
  * a time-sorted array (identical to [[Funnel]]); the matcher then runs
  * once per key on the collected array. The matcher is a memoized
  * backtracking walk — O(events² · tokens) worst case per key, driven by
  * the key's OWN condition events, never the corpus (ClickHouse's
  * engine buffers per-group events the same way). It evaluates as a
  * scalar function on the already-aggregated row — after the shuffle
  * and outside the scan's codegen hot path — so the UDF boundary costs
  * one call per key, not per event.
  */
object Sequence {

  private[analysis] sealed trait Tok
  private[analysis] case class Cond(n: Int, guard: Option[(String, Double)])
    extends Tok
  private[analysis] case object AnyOne extends Tok
  private[analysis] case object AnyStar extends Tok

  /** Parse the pattern subset. Fails loudly on anything else. */
  private[analysis] def parse(pattern: String): Vector[Tok] = {
    var i = 0
    val out = Vector.newBuilder[Tok]
    var pendingGuard: Option[(String, Double)] = None
    def fail(msg: String) = throw new IllegalArgumentException(
      s"sequence pattern '$pattern' at $i: $msg")
    while (i < pattern.length) {
      pattern(i) match {
        case '.' =>
          if (pendingGuard.isDefined)
            fail("a time guard must be followed by (?N)")
          if (i + 1 < pattern.length && pattern(i + 1) == '*') {
            out += AnyStar; i += 2
          } else { out += AnyOne; i += 1 }
        case '(' =>
          val close = pattern.indexOf(')', i)
          if (close < 0 || i + 2 > close) fail("unclosed group")
          val body = pattern.substring(i + 2, close)
          if (pattern(i + 1) != '?') fail("expected (?")
          if (body.startsWith("t")) {
            val m = "^t\\s*(<=|>=|==|<|>)\\s*([0-9.]+)$".r
              .findFirstMatchIn(body).getOrElse(fail("bad time guard"))
            if (pendingGuard.isDefined) fail("doubled time guard")
            pendingGuard = Some((m.group(1), m.group(2).toDouble))
          } else {
            val n = body.toIntOption
              .filter(n => n >= 1 && n <= 63)
              .getOrElse(fail("condition index must be 1..63"))
            out += Cond(n, pendingGuard)
            pendingGuard = None
          }
          i = close + 1
        case c => fail(s"unexpected '$c'")
      }
    }
    if (pendingGuard.isDefined) fail("dangling time guard")
    val toks = out.result()
    if (!toks.exists(_.isInstanceOf[Cond]))
      fail("pattern needs at least one (?N)")
    // a guard on the FIRST cond token has no previous event to measure
    // against — reject rather than guess
    toks.collectFirst { case c: Cond => c }.foreach { first =>
      if (first.guard.isDefined)
        fail("a time guard cannot precede the first condition")
    }
    toks
  }

  private def guardOk(g: Option[(String, Double)], prevTs: Double,
      ts: Double): Boolean = g match {
    case None => true
    case Some((op, v)) =>
      val d = ts - prevTs
      op match {
        case "<" => d < v
        case "<=" => d <= v
        case ">" => d > v
        case ">=" => d >= v
        case "==" => d == v
      }
  }

  /** Minimal end position (exclusive) of a match of toks[ti..] starting
    * exactly at event position p, given the previous matched condition's
    * ts; Int.MaxValue when impossible. Memoized on (ti, p, prevTs). */
  private def minEnd(ts: Array[Double], mask: Array[Long],
      toks: Vector[Tok], memo: mutable.HashMap[(Int, Int, Double), Int],
      ti: Int, p: Int, prevTs: Double): Int = {
    if (ti == toks.length) return p
    val key = (ti, p, prevTs)
    memo.getOrElseUpdate(key, toks(ti) match {
      case Cond(n, g) =>
        if (p < ts.length && (mask(p) & (1L << n)) != 0 &&
            guardOk(g, prevTs, ts(p)))
          minEnd(ts, mask, toks, memo, ti + 1, p + 1, ts(p))
        else Int.MaxValue
      case AnyOne =>
        if (p < ts.length)
          minEnd(ts, mask, toks, memo, ti + 1, p + 1, prevTs)
        else Int.MaxValue
      case AnyStar =>
        // shortest-first: try consuming 0, 1, 2… events and keep the
        // minimal end over all viable splits
        var best = Int.MaxValue
        var q = p
        while (q <= ts.length && best == Int.MaxValue) {
          best = minEnd(ts, mask, toks, memo, ti + 1, q, prevTs)
          q += 1
        }
        best
    })
  }

  /** Unanchored: minimal end over every start position ≥ from. */
  private def searchEnd(ts: Array[Double], mask: Array[Long],
      toks: Vector[Tok], from: Int): Int = {
    val memo = mutable.HashMap.empty[(Int, Int, Double), Int]
    var s = from
    while (s <= ts.length) {
      val e = minEnd(ts, mask, toks, memo, 0, s, Double.NegativeInfinity)
      if (e != Int.MaxValue) return e
      s += 1
    }
    Int.MaxValue
  }

  private[analysis] def matchesSeq(ts: Array[Double], mask: Array[Long],
      toks: Vector[Tok]): Boolean =
    searchEnd(ts, mask, toks, 0) != Int.MaxValue

  private[analysis] def countSeq(ts: Array[Double], mask: Array[Long],
      toks: Vector[Tok]): Long = {
    var n = 0L
    var from = 0
    var e = searchEnd(ts, mask, toks, from)
    while (e != Int.MaxValue) {
      n += 1
      // zero-width safety: a match that consumed nothing still advances
      from = math.max(e, from + 1)
      e = searchEnd(ts, mask, toks, from)
    }
    n
  }

  /** A `(?N)` beyond the supplied condition list can never match —
    * reject it loudly (ClickHouse errors on such patterns too; a typo'd
    * index silently returning false-for-everyone is the trap). */
  private def validateConds(toks: Vector[Tok], conds: Seq[Column],
      pattern: String): Unit =
    toks.foreach {
      case Cond(n, _) if n > conds.size =>
        throw new IllegalArgumentException(
          s"sequence pattern '$pattern' references (?$n) but only " +
            s"${conds.size} conditions were supplied")
      case _ => ()
    }

  /** The grouped (key, sorted considered events) frame both entry
    * points share: each row of `conds` is a bit in the event's mask;
    * rows with an all-zero mask are dropped before the shuffle. */
  private def grouped(df: DataFrame, keyCol: String, tsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty && conds.size <= 63,
      "sequence needs 1..63 conditions")
    val mask = conds.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << (i + 1))).otherwise(0L) }
      .reduce(_ + _)
    df.withColumn("__m", mask)
      .filter(col("__m") =!= 0L)
      .select(col(keyCol), col(tsCol).cast("double").as("__ts"),
        col("__m"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col("__ts"), col("__m"))))
        .as("__ev"))
  }

  /** Per-key `sequenceMatch`: (key, matched). Keys with no considered
    * events emit no row (ClickHouse would return 0 for them — filter or
    * left-join the key universe as needed). */
  def matches(df: DataFrame, keyCol: String, tsCol: String,
      conds: Seq[Column], pattern: String): DataFrame = {
    val toks = parse(pattern)
    validateConds(toks, conds, pattern)
    val f = udf((ev: Seq[org.apache.spark.sql.Row]) => {
      val ts = ev.map(_.getDouble(0)).toArray
      val mk = ev.map(_.getLong(1)).toArray
      matchesSeq(ts, mk, toks)
    })
    grouped(df, keyCol, tsCol, conds)
      .select(col(keyCol), f(col("__ev")).as("matched"))
  }

  /** Per-key `sequenceCount`: (key, n_matches) — non-overlapping,
    * leftmost-first. */
  def counts(df: DataFrame, keyCol: String, tsCol: String,
      conds: Seq[Column], pattern: String): DataFrame = {
    val toks = parse(pattern)
    validateConds(toks, conds, pattern)
    val f = udf((ev: Seq[org.apache.spark.sql.Row]) => {
      val ts = ev.map(_.getDouble(0)).toArray
      val mk = ev.map(_.getLong(1)).toArray
      countSeq(ts, mk, toks)
    })
    grouped(df, keyCol, tsCol, conds)
      .select(col(keyCol), f(col("__ev")).as("n_matches"))
  }
}
