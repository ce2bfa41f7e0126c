package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared eager lineage-truncating materialization for pipelines that
  * reuse an expensive intermediate (Dedup's shingle sets and CC rounds,
  * Similarity's LSH index). The result is NOT registered in the
  * CacheManager, so nothing leaks across pipelines.
  *
  * Two modes, chosen by [[Materialize.ReliableCheckpointKey]]:
  *  - default `localCheckpoint` (single-node / static executors): blocks
  *    live on executors and are released by the ContextCleaner; a lost
  *    executor loses its blocks irrecoverably.
  *  - reliable `checkpoint` (cluster with dynamic allocation / executor
  *    loss): set the conf to `true` AND call
  *    `spark.sparkContext.setCheckpointDir(<shared fs path>)`; the frame
  *    is written to the shared filesystem and survives executor loss,
  *    and file cleanup follows
  *    `spark.cleaner.referenceTracking.cleanCheckpoints`.
  */
object Materialize {

  /** Session conf key: `true` switches EVERY graft pipeline's internal
    * materialization (dedup shingles, CC rounds, cosine-LSH index) from
    * `localCheckpoint` to reliable `checkpoint` — one durability story
    * across all scale paths. */
  val ReliableCheckpointKey = "spark.graft.reliableCheckpoint"

  /** The dedup-scoped key this conf was first published under. Still
    * honored: silently ignoring it would downgrade an existing
    * deployment's durability to `localCheckpoint` — the exact
    * executor-loss failure the conf exists to prevent. */
  val LegacyReliableCheckpointKey = "spark.graft.dedup.reliableCheckpoint"

  private[graft] def reliableMode(df: DataFrame): Boolean = {
    val conf = df.sparkSession.conf
    conf.get(ReliableCheckpointKey,
      conf.get(LegacyReliableCheckpointKey, "false")).toBoolean
  }

  /** Eager lineage-truncating materialization in the configured mode.
    * Reliable `checkpoint()` runs a SECOND job to write the checkpoint
    * files; the frame is persisted first so that write job reads cached
    * blocks instead of recomputing the whole plan (then unpersisted — the
    * checkpoint files are the durable copy). */
  def eagerCheckpoint(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (reliableMode(df)) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableCheckpointKey=true (or the legacy " +
          s"$LegacyReliableCheckpointKey) requires " +
          "spark.sparkContext.setCheckpointDir(...)")
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint() finally df.unpersist(blocking = false)
    } else df.localCheckpoint()
  }
}
