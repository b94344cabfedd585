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
    // MAP columns are not hashable (Spark rejects hash-on-map: equal maps
    // may differ in entry order) — their key-sorted entry arrays carry the
    // same value identity and hash deterministically
    val rowHash = hash(incoming.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          array_sort(map_entries(col(f.name)))
        case _ => col(f.name)
      }
    }.toSeq: _*)
    val ordering = (col("__prio").desc +: orderCol.map(col(_).desc).toSeq) :+ rowHash.asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    tgt.unionByName(src)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  /** Type-2 slowly-changing-dimension apply — the warehouse HISTORY answer
    * to the same key-conflict problem [[upsert]] solves destructively:
    * instead of overwriting, an attribute change CLOSES the key's current
    * row (`valid_to` = the change instant, `is_current` = false) and opens
    * a new current one. `history` must carry `keys ++ attrs ++ (valid_from,
    * valid_to, is_current)`; `incoming` carries `keys ++ attrs ++ tsCol`.
    *
    * One batch may hold MANY updates per key: rows are chained per key in
    * `tsCol` order (ties broken by `tieCol` — pass a line/sequence number
    * for a deterministic chain), consecutive equal-attribute observations
    * collapse into the earlier row (a re-observed unchanged value extends
    * the run, opening no new version), and validity windows butt-join:
    * each version's `valid_to` is exactly the next version's `valid_from`.
    * Observations at or before the current row's `valid_from` are LATE
    * data and are dropped — history already supersedes them. That policy
    * is also what makes re-applying a batch a no-op (every observation is
    * now at-or-before the version it opened), the same safe-retry property
    * the reference leans on.
    *
    * Scale shape: already-closed history passes through UNTOUCHED — the
    * chain recompute reads only current rows + the batch, so the cost is
    * O(live keys ∩ batch) per apply: one key-shuffle for the late-data
    * anti-filter join and one for the window. Deterministic for a fixed
    * batch (total order per key).
    */
  def scd2(history: DataFrame, incoming: DataFrame, keys: Seq[String],
      attrs: Seq[String], tsCol: String, tieCol: Option[String] = None): DataFrame = {
    val histCols = keys ++ attrs ++ Seq("valid_from", "valid_to", "is_current")
    val cur = history.filter(col("is_current"))
      .select(keys.map(col) ++ attrs.map(col) :+
        col("valid_from").alias("__ts") :+ lit(0).alias("__src") :+
        lit(null).cast("long").alias("__tie"): _*)
    // late-data gate: only observations STRICTLY after the key's open
    // version can extend its chain (re-delivered batches drop out here)
    val inc = incoming.select(keys.map(col) ++ attrs.map(col) :+
        col(tsCol).alias("__ts") :+ lit(1).alias("__src") :+
        tieCol.map(col(_).cast("long")).getOrElse(lit(null).cast("long"))
          .alias("__tie"): _*)
      .join(cur.select(keys.map(col) :+ col("__ts").alias("__cur_from"): _*),
        keys, "left")
      .filter(col("__cur_from").isNull || col("__ts") > col("__cur_from"))
      .drop("__cur_from")
    // per-key timeline: the open row (if any) first at its own valid_from,
    // then the surviving batch in observation order
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__src"), col("__tie"))
    val attrTuple = struct(attrs.map(col): _*)
    val chained = cur.unionByName(inc)
      .withColumn("__prev", lag(attrTuple, 1).over(w))
      // change points only: the first observation of a key, or a row whose
      // attrs differ from its predecessor (null-safe: a null attribute is
      // a value, not a wildcard); equal-attr re-observations collapse
      .filter(col("__prev").isNull || !(col("__prev") <=> attrTuple))
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(histCols.map(col): _*)
    history.filter(!col("is_current")).select(histCols.map(col): _*)
      .unionByName(chained)
  }
}
