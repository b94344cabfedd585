package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Incremental materialized-view maintenance over a [[LakeTable]] — the
  * warehouse gold-aggregate pattern (the reference recomputes its gold
  * daily aggregate from scratch every run,
  * `dags/coin_data_pipeline_optimized.py:923-933`) made O(delta): the view
  * is `SELECT groupCols, count(*), sum(col)... GROUP BY groupCols`, stored
  * as its OWN LakeTable keyed on the group columns, and `refresh` applies
  * only the base table's change feed since the last sync instead of
  * rescanning the table.
  *
  * Maintenance algebra (classic self-maintainable aggregates): each change
  * row carries a sign — +1 for `insert`/`update_postimage`, −1 for
  * `delete`/`update_preimage` — so `count` advances by Σsign and each
  * `sum` by Σ(sign·value). Sums run in DECIMAL(38,6): decimal addition is
  * exact and associative, so the incrementally-maintained value is
  * BIT-equal to a full recompute, retractions included (floating-point
  * sums would drift under subtraction). `avg` and friends derive at read
  * time.
  *
  * `min`/`max` (opt-in via `minMaxCols`) are NOT self-maintainable under
  * retraction — a deleted extremum's successor is unknowable from the
  * delta — so refresh splits touched groups by the textbook rule:
  * GROW-ONLY groups (no delete/update_preimage in the feed) fold the
  * delta in O(delta) (`least`/`greatest` of old and incoming, and Spark's
  * null-skipping least/greatest is exactly the right semantics here);
  * RETRACTION groups are recomputed from the base table's new snapshot,
  * restricted to those groups. That recompute is the inherent cost of the
  * aggregate class — it scans the base filtered to the retraction groups
  * (delivery-bounded only if the base is clustered by the group columns;
  * otherwise a pruned-as-possible scan), which is why sum/count remain
  * the default and min/max are opt-in.
  *
  * Scale shape, end to end: the CDF read is O(changed buckets) of the
  * base table ([[LakeTable.changes]]); the delta aggregation shuffles
  * only change rows; the view update reads only the buckets holding
  * TOUCHED groups ([[LakeTable.lookup]] + [[LakeTable.applyChanges]]).
  * A 100-row delivery against a 100 TB table updates the view in
  * delivery-sized work.
  *
  * Crash safety: a refresh publishes the new view version FIRST, then
  * advances the `_sync` marker (table version ↔ view version, atomic
  * rename). A crash between the two leaves an ORPHAN view version; the
  * retry re-reads the view at the marker's PINNED version and re-applies
  * the same feed on it (`baseVersion` in [[LakeTable.applyChanges]]), so
  * the orphan is never compounded — refresh is idempotent, the lake
  * discipline every sink in this repo follows.
  */
object MaterializedView {

  private final case class Sync(tableVersion: Long, mvVersion: Long)

  private def hfs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val SumType = "decimal(38,6)"

  private def writeSync(spark: SparkSession, mvRoot: String, s: Sync): Unit = {
    val fs = hfs(spark, mvRoot)
    val dir = new Path(mvRoot, "_sync")
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val staged = new Path(dir, s".staging-${java.util.UUID.randomUUID}")
    val out = fs.create(staged, false)
    try out.write(
      s"""{"table_version":${s.tableVersion},"mv_version":${s.mvVersion}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.rename(staged, new Path(dir, s"${s.tableVersion}.json"))
  }

  private def readSync(spark: SparkSession, mvRoot: String): Sync = {
    val fs = hfs(spark, mvRoot)
    val dir = new Path(mvRoot, "_sync")
    require(fs.exists(dir), s"no MaterializedView sync state at $mvRoot")
    val latest = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") &&
        n.dropRight(5).forall(_.isDigit) => n.dropRight(5).toLong }
      .max
    val in = fs.open(new Path(dir, s"$latest.json"))
    val body = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    def field(name: String): Long = {
      val at = body.indexOf("\"" + name + "\":")
      require(at >= 0, s"sync marker: missing $name")
      body.drop(at + name.length + 3).takeWhile(c => c.isDigit || c == '-').toLong
    }
    Sync(field("table_version"), field("mv_version"))
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Nil): DataFrame = {
    val aggs = (count(lit(1)).alias("cnt") +: sumCols.map(c =>
      sum(col(c).cast(SumType)).cast(SumType).alias(s"sum_$c"))) ++
      minMaxCols.flatMap(c => Seq(min(col(c)).alias(s"min_$c"),
        max(col(c)).alias(s"max_$c")))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full-compute the view at the base table's CURRENT version and record
    * the sync point. View schema: `groupCols`, `cnt` (long), one
    * `sum_<c>` DECIMAL(38,6) per sum column, and `min_<c>`/`max_<c>` in
    * the base column's own type per min/max column.
    */
  def init(spark: SparkSession, tableRoot: String, mvRoot: String,
      groupCols: Seq[String], sumCols: Seq[String],
      numBuckets: Int = 16, minMaxCols: Seq[String] = Nil): Unit = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(sumCols.nonEmpty, "sumCols must be non-empty")
    val tv = LakeTable.manifest(spark, tableRoot).version
    val view = aggregate(LakeTable.read(spark, tableRoot, Some(tv)),
      groupCols, sumCols, minMaxCols)
    LakeTable.init(view, mvRoot, groupCols, numBuckets)
    writeSync(spark, mvRoot, Sync(tv, 0L))
  }

  /** Advance the view to the base table's current version by applying the
    * change feed since the last sync. Returns the view version serving
    * the new state (unchanged if already current).
    */
  def refresh(spark: SparkSession, tableRoot: String, mvRoot: String): Long = {
    val sync = readSync(spark, mvRoot)
    val tv = LakeTable.manifest(spark, tableRoot).version
    if (tv == sync.tableVersion) return sync.mvVersion

    val mvManifest = LakeTable.manifest(spark, mvRoot, Some(sync.mvVersion))
    val groupCols = mvManifest.keys
    val viewFields = org.apache.spark.sql.types.StructType
      .fromDDL(mvManifest.schemaDdl).fieldNames.toSeq
    val sumCols = viewFields
      .collect { case n if n.startsWith("sum_") => n.stripPrefix("sum_") }
    val minMaxCols = viewFields
      .collect { case n if n.startsWith("min_") => n.stripPrefix("min_") }

    val feed = LakeTable.changes(spark, tableRoot, sync.tableVersion, tv)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val deltaAggs = (sum(sign).alias("d_cnt") +: sumCols.map(c =>
      sum(col(c).cast(SumType) * sign).cast(SumType).alias(s"d_sum_$c"))) ++
      // incoming extrema (insert/post rows only) + the retraction flag
      // that routes the group to base recompute
      minMaxCols.flatMap(c => Seq(
        min(when(sign === 1, col(c))).alias(s"d_min_$c"),
        max(when(sign === 1, col(c))).alias(s"d_max_$c"))) ++
      (if (minMaxCols.isEmpty) Nil else Seq(
        max(when(sign === -1, lit(1L)).otherwise(lit(0L))).alias("__retract")))
    // materialize the grouped delta ONCE (≤ touched-groups rows): its
    // lineage is the whole change feed (two snapshot reads + full-outer
    // join), and three consumers follow — without the barrier each would
    // re-run the feed
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .localCheckpoint()

    // current state of ONLY the touched groups, read at the PINNED view
    // version (crash-orphan versions are invisible to the retry)
    val current = LakeTable.lookup(spark, mvRoot,
      delta.select(groupCols.map(col): _*), Some(sync.mvVersion))

    // authoritative extrema for groups that saw a retraction: recompute
    // from the base's NEW snapshot restricted to those groups — the
    // inherent non-self-maintainable cost (see class doc)
    val recomputed =
      if (minMaxCols.isEmpty) None
      else {
        val retractGroups = delta.filter(col("__retract") === 1L)
          .select(groupCols.map(col): _*)
        val rAggs = minMaxCols.flatMap(c => Seq(
          min(col(c)).alias(s"r_min_$c"), max(col(c)).alias(s"r_max_$c")))
        Some(LakeTable.read(spark, tableRoot, Some(tv))
          .join(broadcast(retractGroups), groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(rAggs.head, rAggs.tail: _*))
      }

    // same barrier again: applyChanges consumes this three ways (upserts,
    // delete keys, touched-bucket set) — all on a touched-groups-sized frame
    val joined0 = delta.join(current, groupCols, "full_outer")
    val joined = recomputed.fold(joined0)(r => joined0.join(r, groupCols, "left"))
    val merged = joined
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .alias("cnt")) ++ sumCols.map(c =>
        (coalesce(col(s"sum_$c"), lit(0).cast(SumType)) +
          coalesce(col(s"d_sum_$c"), lit(0).cast(SumType)))
          .cast(SumType).alias(s"sum_$c")) ++ minMaxCols.flatMap(c => Seq(
        // grow-only: fold the incoming extremum (least/greatest SKIP
        // nulls — absent side passes through); retraction: authoritative
        when(col("__retract") === 1L, col(s"r_min_$c"))
          .otherwise(least(col(s"min_$c"), col(s"d_min_$c"))).alias(s"min_$c"),
        when(col("__retract") === 1L, col(s"r_max_$c"))
          .otherwise(greatest(col(s"max_$c"), col(s"d_max_$c"))).alias(s"max_$c"))): _*)
      .localCheckpoint()

    val upserts = merged.filter(col("cnt") > 0)
    val gone = merged.filter(col("cnt") <= 0)
      .select(groupCols.map(col): _*)
    val mvVersion =
      try LakeTable.applyChanges(spark, mvRoot, upserts, gone,
        Some(sync.mvVersion))
      finally {
        merged.unpersist(blocking = false)
        delta.unpersist(blocking = false)
      }
    writeSync(spark, mvRoot, Sync(tv, mvVersion))
    mvVersion
  }

  /** The view as served: its lake table's newest SYNCED version. */
  def read(spark: SparkSession, mvRoot: String): DataFrame =
    LakeTable.read(spark, mvRoot, Some(readSync(spark, mvRoot).mvVersion))
}
