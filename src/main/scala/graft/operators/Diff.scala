package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data view between two versions of a keyed
  * table ("what did this delivery add / remove / rewrite"), the audit
  * companion to the idempotent-publish sinks: after a re-run, the diff
  * against the previous snapshot IS the effective change set, and an
  * unexpected `removed`/`changed` row is the first sign of an upstream
  * regression.
  *
  * Rows are compared by a content hash over the non-key columns: each
  * value casts to string with an explicit ␀ sentinel for SQL NULL (a
  * bare `concat_ws` SKIPS nulls, which would make ("a", null) collide
  * with (null, "a")), columns joined in NAME order so the hash is stable
  * under column reordering. Engine-replayable: md5 over plain casts, no
  * engine-specific hash.
  *
  * Executes as one equi-join on the key (sort-merge/hash, AQE-sized) over
  * projections that carry ONLY key + 16-byte digest — full rows never
  * cross the shuffle regardless of document width. Returns key columns +
  * `change` ∈ {added, removed, changed} (+ unchanged when
  * `includeUnchanged`), `old_hash`, `new_hash`.
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schemas differ: ${oldDf.columns.sorted.mkString(",")} vs " +
        s"${newDf.columns.sorted.mkString(",")}")
    require(keyCols.forall(oldDf.columns.contains),
      s"unknown key columns: ${keyCols.filterNot(oldDf.columns.contains).mkString(",")}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).sorted
    require(valCols.nonEmpty, "need at least one non-key column to compare")
    val hash = md5(concat_ws("|",
      valCols.map(c => coalesce(col(c).cast("string"), lit("␀"))): _*))
    val o = oldDf.select(keyCols.map(col) :+ hash.alias("old_hash"): _*)
    val n = newDf.select(keyCols.map(col) :+ hash.alias("new_hash"): _*)
    val joined = o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
    val out = joined.select(
      keyCols.map(col) :+ col("change") :+ col("old_hash") :+ col("new_hash"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }
}
