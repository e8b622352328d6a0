package graft.ops

import org.apache.spark.sql.SparkSession

/** Scale-adaptive execution settings for ITERATIVE dataflow whose per-round
  * state is a measured, materialized table (edge lists, label tables).
  *
  * Why (guide §1.2 step 1 / §2.2): the per-round cost of the qg/qd fixpoint
  * loops at small state is pure scheduling latency — under AQE every
  * localCheckpoint(true) materialization becomes one job PER QUERY STAGE
  * (measured: qg12's 3-stage rounds ran 325 jobs for a 36-node graph,
  * ~34 ms/job), and the session's shuffle-partition count (sized for the
  * corpus-shaped queries) fans every tiny label shuffle into 32 reducers.
  *
  * The fix the guide prescribes is to DERIVE partitioning from input size
  * rather than a constant: once the loop's edge list is materialized and
  * counted (every caller already counts it to pin the cache), the rounds run
  * with shuffle parallelism sized from that measured row count
  * (`rowsPerPartition` = 64k rows ≈ a few MB of long-pairs per task), and
  * with AQE off — the plans inside a round are fixed and already sized, so
  * adaptive re-planning only adds a job per stage. Session conf is restored
  * on exit; the query's final LAZY tail still plans under the session's
  * normal configuration. At corpus scale the same formula yields hundreds of
  * partitions, so nothing here is a local-mode constant.
  */
private[ops] object IterTuning {

  private val RowsPerPartition = 65536L

  /** The same state-derived partition count [[withStateSized]] uses, for
    * callers that need to lay out a loop-reused table explicitly (e.g.
    * coalescing an adjacency list whose feeder pinned a wide repartition —
    * every round would otherwise inherit the wide layout as per-stage
    * tasks). Capped at the session's shuffle parallelism.
    */
  def partitionsFor(spark: SparkSession, stateRows: Long): Int = {
    val cap = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    math.min(cap.toLong, stateRows / RowsPerPartition + 1).toInt
  }

  /** Run `body` (the eager fixpoint rounds) with shuffle parallelism derived
    * from the measured per-round state size, AQE disabled, restoring the
    * session conf afterwards. Safe for any result-deterministic plan (hash
    * joins/aggregates over exact types — partitioning never changes their
    * output), which every caller here is.
    */
  def withStateSized[T](spark: SparkSession, stateRows: Long)(body: => T): T = {
    val conf = spark.conf
    val oldP = conf.get("spark.sql.shuffle.partitions")
    val oldA = conf.get("spark.sql.adaptive.enabled")
    val cap = math.max(1, oldP.toInt)
    val p = math.min(cap.toLong, stateRows / RowsPerPartition + 1).toString
    conf.set("spark.sql.shuffle.partitions", p)
    conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", oldP)
      conf.set("spark.sql.adaptive.enabled", oldA)
    }
  }
}
