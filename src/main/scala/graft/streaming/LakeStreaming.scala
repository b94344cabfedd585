package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.sinks.{LakeTable, MaterializedView}

/** Streaming maintenance of a keyed lake table AND its gold aggregate in
  * one micro-batch loop — the streaming twin of the reference's
  * load-then-aggregate warehouse DAG (its batch run recomputes gold from
  * scratch, `dags/coin_data_pipeline_optimized.py:923-933`; here gold
  * advances by the change feed the upsert itself produced).
  *
  * Per batch: `LakeTable.merge(batch)` (touched-bucket copy-on-write)
  * then `MaterializedView.refresh` (CDF-driven, O(delta)). Exactly-once
  * EFFECT with no extra bookkeeping, because the two halves compose:
  *
  *  - a REPLAYED batch re-merges identical rows — the rewritten buckets'
  *    rows are value-identical, so the change feed between the retry's
  *    versions is EMPTY and the view does not move (the feed, not an
  *    offset ledger, is what nets out the replay);
  *  - a crash between merge and refresh just leaves the view one sync
  *    behind; the next batch's refresh folds both deliveries' feed in —
  *    and the view's own crash window is covered by
  *    [[MaterializedView.refresh]]'s pinned-snapshot marker protocol.
  *
  * Scale: each trigger pays O(batch ∪ touched buckets), never O(table) —
  * the construction a 100 TB gold table needs from a daily-delivery
  * stream.
  */
object LakeStreaming {

  /** Caller starts the returned writer with a checkpointLocation and
    * trigger. The lake table must exist ([[LakeTable.init]]) and the view
    * must be initialized over it ([[MaterializedView.init]]) before the
    * stream starts.
    */
  def goldIngest(source: DataFrame, tableRoot: String, mvRoot: String,
      orderCol: Option[String] = None): DataStreamWriter[Row] =
    source.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        // localCheckpoint: the merge consumes the batch twice (touched-
        // bucket collect + rewrite); a streaming source can't be re-read
        val b = batch.toDF().localCheckpoint()
        try {
          LakeTable.merge(spark, tableRoot, b, orderCol)
          MaterializedView.refresh(spark, tableRoot, mvRoot)
        } finally b.unpersist(blocking = false)
        ()
    }

  /** [[goldIngest]] for a JOIN view: the stream delivers FACT rows; the
    * dim evolves out-of-band (its own deliveries land between batches).
    * Per batch: fact merge, then [[graft.sinks.JoinMaterializedView
    * .refresh]] — which folds BOTH the batch's fact feed and any dim
    * versions that landed since the last sync, so a dim attribute move
    * published mid-stream re-attributes history in the next trigger
    * without a separate scheduler. The replay-nets-to-empty and
    * crash-one-sync-behind arguments carry over verbatim: both halves
    * read change feeds, not offsets.
    */
  def joinGoldIngest(source: DataFrame, factRoot: String, dimRoot: String,
      mvRoot: String, orderCol: Option[String] = None): DataStreamWriter[Row] =
    source.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().localCheckpoint()
        try {
          LakeTable.merge(spark, factRoot, b, orderCol)
          graft.sinks.JoinMaterializedView.refresh(spark, factRoot,
            dimRoot, mvRoot)
        } finally b.unpersist(blocking = false)
        ()
    }
}
