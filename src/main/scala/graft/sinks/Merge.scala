package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pure-Spark key-conflict semantics (SURVEY §2.4 J1/J2) — the lake-side
  * equivalents of the reference's Postgres `ON CONFLICT` sinks:
  *
  *  - `DO NOTHING`  (reference `dags/coin_data_pipeline_optimized.py:665-670`)
  *    = insert only rows whose key is absent = left-anti join + union;
  *  - `DO UPDATE`   (reference `:923-933`)
  *    = last-writer-wins merge = union + row_number over the key.
  *
  * Both are idempotent (`merge(merge(t, s), s) == merge(t, s)`), which is the
  * property the reference leans on for safe re-runs.
  *
  * Scale posture: one shuffle on the key columns each. When the incoming side
  * is small (the reference ingests ~100 rows/day against a growing target),
  * callers should wrap it in `broadcast(...)` so the anti-join is a
  * BroadcastHashJoin and the big target never shuffles; AQE's skew-join
  * handles hot keys on the merge path.
  */
object Merge {

  /** `INSERT … ON CONFLICT DO NOTHING`: keep all of `existing`, add the
    * incoming rows whose key is not already present. Incoming is deduplicated
    * on the key first (the DB conflict target enforces at-most-one winner).
    */
  def insertIgnore(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val fresh = incoming
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
    existing.unionByName(fresh)
  }

  /** `INSERT … ON CONFLICT DO UPDATE` (last-writer-wins): incoming rows
    * replace existing rows with the same key; unmatched rows on either side
    * survive. Ties inside `incoming` are broken by `orderCol` descending when
    * given (e.g. an event-time column), then by a murmur3 hash of the full
    * row — without that final tiebreak, equal-priority duplicates would win
    * by shuffle arrival order and two runs of the same merge could publish
    * different tables.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      orderCol: Option[String] = None): DataFrame = {
    val src = incoming.withColumn("__prio", lit(1))
    val tgt = existing.withColumn("__prio", lit(0))
    val rowHash = hash(incoming.columns.map(col).toSeq: _*)
    val ordering = (col("__prio").desc +: orderCol.map(col(_).desc).toSeq) :+ rowHash.asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    tgt.unionByName(src)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }
}
