package graft.operators

import org.apache.spark.sql.SparkSession

/** Partition-count sizing for SMALL persisted loop state (rank vectors,
  * label tables, BPE vocabularies) whose row count the caller has
  * already measured with the count() that materializes the cache.
  *
  * A `persist()` pins its child plan's partitioning, and AQE does not
  * re-optimize cached plans by default
  * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false` —
  * flipping it globally was A/B-measured in r16-opt and REJECTED: it
  * also coalesces the dedup pipeline's candidate-scale caches, whose
  * CPU-heavy consumers then run 1-2 tasks, the verify-skill rule-2
  * failure; x06 1.63×, x27 1.71× slower). So iterative operators size
  * their cached state explicitly from the measured row count: tiny
  * state collapses to one partition (a 5-node PageRank stops running
  * 32-task stages per round), while large state keeps full parallelism
  * because the divisor is a rows-per-partition target, not a constant.
  * `coalesce()` applications of this are narrow — no extra shuffle.
  */
object SizedParts {
  /** Rows per cached-loop partition. Loop-state rows are narrow (ids +
    * a few longs, ≈tens of bytes), so 64k rows ≈ low-MB partitions —
    * small enough for per-round task balance, large enough that the
    * per-task fixed cost never dominates. */
  val RowsPerPartition = 65536L

  def apply(spark: SparkSession, rows: Long): Int = {
    val want = ((rows + RowsPerPartition - 1) / RowsPerPartition).toInt
    math.max(1, math.min(spark.sparkContext.defaultParallelism, want))
  }
}
