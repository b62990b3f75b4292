package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span self-time attribution — the trace-flamegraph aggregation.
  *
  * A span's SELF time is its duration minus the union length of its
  * children's intervals (clipped to the span): the time the service
  * itself was doing work rather than waiting on callees. Summed per
  * service/operation it yields the flamegraph / "where is the time
  * actually spent" view the reference's trace detail page renders from
  * the assembled span tree (otel_traces' Duration + ParentSpanId
  * columns, docker/otel-collector/.../00002_otel_traces.sql; the
  * waterfall component computes child overlap client-side per trace —
  * this operator is that computation pushed into the engine for ALL
  * traces at once).
  *
  * Shape: one hash join (child → its parent's interval) and one
  * per-parent gaps-and-islands pass. The window partitions are
  * per-parent — bounded by a span's direct fan-out (callees per span),
  * never by trace size or corpus size — so at 100 TB the plan is one
  * shuffle on the parent id plus per-group work on sibling sets. No
  * interval ever explodes to its covered instants: overlap among
  * siblings collapses via the running-max island merge, O(fan-out)
  * rows per parent.
  */
object CriticalPath {

  /** Per-span self time. Input: one row per span with long columns
    * `idCol`, `parentCol` (null ⇒ root), `startCol`, `endCol`
    * (half-open [start, end)). Output: the input frame plus
    * `covered` (union length of clipped child intervals, 0 when
    * childless) and `self_time` (duration − covered, ≥ 0 when children
    * nest properly; clipping guarantees ≥ 0 even on malformed spans
    * that outlive their parent).
    *
    * Sibling intervals may overlap arbitrarily (async fan-out): the
    * union length is exact, via running-max islands per parent.
    *
    * The input frame is read from three plan branches (parent side,
    * child side, final re-attach) — each a 4-column pruned projection,
    * so a parquet-backed frame costs three cheap column scans. A spans
    * frame derived by expensive computation should be persisted by the
    * caller first (the multi-branch convention, see Dedup).
    */
  def selfTime(spans: DataFrame, idCol: String = "id",
      parentCol: String = "parent", startCol: String = "s",
      endCol: String = "e"): DataFrame = {
    val parents = spans.select(col(idCol).cast("long").as("__pid"),
      col(startCol).cast("long").as("__ps"),
      col(endCol).cast("long").as("__pe"))
    // child interval clipped to its parent; children that fall entirely
    // outside the parent's interval contribute nothing (dropped early,
    // before any window work)
    val clipped = spans
      .filter(col(parentCol).isNotNull)
      .select(col(parentCol).cast("long").as("__pid"),
        col(startCol).cast("long").as("__cs0"),
        col(endCol).cast("long").as("__ce0"))
      .join(parents, "__pid")
      .select(col("__pid"),
        greatest(col("__cs0"), col("__ps")).as("__cs"),
        least(col("__ce0"), col("__pe")).as("__ce"))
      .filter(col("__ce") > col("__cs"))
    // gaps-and-islands union length per parent: a child starts a new
    // island iff it begins strictly after everything seen so far ends
    val w = Window.partitionBy("__pid").orderBy("__cs", "__ce")
    val prevMax = max(col("__ce"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col("__cs") > prevMax, 1L).otherwise(0L))
      .over(w)
    val covered = clipped
      .withColumn("__isl", island)
      .groupBy(col("__pid"), col("__isl"))
      .agg((max(col("__ce")) - min(col("__cs"))).as("__len"))
      .groupBy(col("__pid"))
      .agg(sum(col("__len")).as("covered"))
    spans
      .join(covered, col(idCol).cast("long") === col("__pid"), "left")
      .drop("__pid")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .withColumn("self_time",
        (col(endCol).cast("long") - col(startCol).cast("long")) -
          col("covered"))
  }
}
