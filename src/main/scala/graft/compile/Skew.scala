package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * At 100 TB a handful of hot keys (one service emitting half the logs, a
  * null trace id) can pin an entire shuffle partition on one executor. AQE's
  * skew-join handling (spark.sql.adaptive.skewJoin) splits oversized
  * sort-merge partitions automatically and is the first line of defense;
  * explicit salting is for the cases AQE can't touch — shuffled hash joins,
  * or when the small side is replicable and the hot keys are known to
  * dominate.
  *
  * The reference never joins server-side (SURVEY §2.6) so this has no
  * reference twin; it exists for the engine's own cross-source correlation
  * joins (log↔trace on TraceId, service-map self-join) where OTel key skew
  * is the norm.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Equi-join `big ⋈ small` on `keys`, with the big side's rows scattered
    * across `salt` sub-keys and the small side replicated `salt` times —
    * every hot key's rows spread over `salt` reducers instead of one.
    *
    * The salt is derived by hashing a per-row id, not rand(), so task
    * retries re-produce the same assignment (any assignment is correct;
    * determinism keeps speculative execution consistent). Inner joins
    * only: replicating the small side breaks outer-join null semantics.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must spread keys over >1 sub-key")
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong))
        .cast("int"))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-stage aggregation for skewed group keys whose partials compose:
    * stage 1 aggregates on (keys, salt) — spreading each hot key over
    * `salt` reducers — stage 2 merges the partials per key. count/sum
    * compose as sums; min/max as themselves. (Spark's hash aggregate
    * already does map-side partial aggregation, which covers most skew;
    * this is the explicit form for when a single reduce key still
    * overflows a partition — e.g. high-cardinality intermediate state.) */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame = {
    require(salt > 1, "salt must spread keys over >1 sub-key")
    val stage1 = df.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    stage1.groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum"),
        min(col("__min")).as("min"), max(col("__max")).as("max"))
  }
}
