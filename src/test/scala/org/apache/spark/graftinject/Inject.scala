package org.apache.spark.graftinject

import org.apache.spark.shuffle.FetchFailedException

/** Test-only escape hatch: FetchFailedException is private[spark], so the
  * fault-injection spec reaches it through this org.apache.spark-namespace
  * shim — the same pattern the reference's Spark integration uses for its
  * shuffle classes (client-spark lives under org.apache.spark.shuffle.celeborn).
  */
object Inject {
  /** Throw a fetch failure for a REAL shuffle id (a made-up id crashes the
    * DAGScheduler's event loop: shuffleIdToMapStage lookup fails). A null
    * block-manager address is the "unknown location" form — the scheduler
    * resubmits the map stage without unregistering outputs. */
  def fetchFailed(shuffleId: Int, reduceId: Int, msg: String): Nothing =
    throw new FetchFailedException(null, shuffleId, 0L, 0, reduceId, msg, null)
}
