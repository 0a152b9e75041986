package graft.ops

import org.apache.spark.sql.DataFrame

/** "New files" detection — the reference's Drive sensor keeps a seen-set
  * and emits listing entries whose id is not in it
  * (`airflow/plugins/google_drive_sensor.py:39,45-46`), i.e. an anti-join.
  * Batch form here; the streaming analogue (file-source checkpoint as the
  * seen-set) lives in [[graft.streaming.FileWatch]].
  */
object NewFiles {
  /** listing ∖ seen on idCol (left_anti: Catalyst broadcasts a small seen
    * side automatically; at scale both sides hash-partition on id).
    */
  def newFiles(listing: DataFrame, seen: DataFrame, idCol: String): DataFrame =
    listing.join(seen.select(idCol).distinct(), Seq(idCol), "left_anti")

  /** seen ∪= newly-observed ids (google_drive_sensor.py:45-46). */
  def updateSeen(seen: DataFrame, newlySeen: DataFrame, idCol: String): DataFrame =
    seen.select(idCol).union(newlySeen.select(idCol)).distinct()
}
