package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative operators. `Dataset.unpersist` only
  * touches the SQL cache; an eager `localCheckpoint`'s blocks live in the
  * BLOCK MANAGER until the ContextCleaner GC-reclaims the RDD — which needs
  * the owning Dataset to become unreachable first, far too late for a loop
  * that checkpoints every round. Without explicit release an iterative
  * operator leaks one full frame per round for the life of the job; across
  * a long session those blocks crowd the unified memory region and surface
  * as ambient slowdowns in UNRELATED queries (the round-6 q181 ghost: 13.6 s
  * suite-ambient vs 3.2 s isolated, same plan, same bytes).
  */
object Checkpoints {

  /** Release the storage behind an eager [[DataFrame.localCheckpoint]] once
    * the frame is SUPERSEDED. Only call after every consumer has
    * materialized — the truncated lineage cannot recompute, so a released
    * checkpoint must never be read again (an iterative loop releases round
    * i only after round i+1's eager checkpoint holds).
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
    case _ => ()
  }
}
