package graft.io

import org.apache.spark.sql.DataFrame

/** Plan/lineage truncation with ONE cluster-safe policy for the whole engine
  * (SURVEY.md §4): reliable `checkpoint` when the session has a checkpoint dir
  * configured — survives executor loss, the documented default for real
  * multi-executor runs — else eager `localCheckpoint` (sandbox / tests;
  * executor-local blocks, fastest). Every corpus-scale pin (CC iterations,
  * sorted-neighborhood rank, skew tails, near-dup signatures) routes through
  * here so configuring one checkpoint dir upgrades them all.
  */
object Persist {
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
