package graft.cdc

import org.apache.spark.sql.DataFrame

/** Probe access to A102's pre-filled queue frame (the r16 DrainProbe
  * compares drain formulations over the identical queue). */
object DynStreamQueueProbeAccess {
  def queue(cl: DataFrame): DataFrame =
    DynStreamQueue.queueFrame(cl, DynStreamQueue.NRegions,
      DynStreamQueue.SignalStep)
}
