package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Keyed lake table with copy-on-write merge — the file-level construction
  * behind every gold table at 100 TB. [[Merge]] gives the ROW semantics
  * (the reference's `ON CONFLICT` pair re-expressed over DataFrames); this
  * gives the STORAGE semantics the reference delegates to Postgres: a
  * 100-row delta against a 100 TB table must not rewrite the table.
  *
  * Construction (the public Delta/Iceberg/Hudi design point, original
  * implementation):
  *
  *   - '''Hash-bucketed data files.''' Rows land in `numBuckets` buckets by
  *     murmur3 of the key columns. A merge computes the delta's touched
  *     bucket set (≤ numBuckets, a bounded driver collect), reads ONLY
  *     those buckets' files, and writes replacements for ONLY them —
  *     write cost is O(delta ∕ bucket-granularity), never O(table).
  *   - '''Manifest = the table.''' A version's JSON manifest under
  *     `_versions/` lists every live data file (with its bucket and the
  *     schema DDL). Data files are immutable and SHARED across versions;
  *     a merge's new manifest carries the untouched buckets' entries
  *     verbatim. Readers resolve a manifest to an explicit file list —
  *     never a directory scan — so concurrent writers cannot make a
  *     reader see a half-published state.
  *   - '''Atomic publish, invisible crashes.''' New data files are written
  *     to a fresh UUID subdirectory first; the ONLY commit point is the
  *     rename of the next manifest into `_versions/`. A crash before that
  *     leaves unreferenced files (invisible to every reader; reclaimed by
  *     [[vacuum]]) — never a torn table. Re-running a crashed merge
  *     converges: [[Merge.upsert]] is idempotent on the same delta.
  *   - '''Snapshot isolation + time travel.''' [[read]] pins a manifest;
  *     [[vacuum]] keeps the newest `keepLast` versions (the replay
  *     horizon) and deletes data files no kept manifest references.
  *
  * Single-writer-at-a-time per table (the usual lake discipline; the
  * reference's Airflow DAG serializes writers the same way). Readers are
  * unrestricted.
  */
object LakeTable {

  final case class Manifest(version: Long, keys: Seq[String], numBuckets: Int,
      schemaDdl: String, files: Seq[(String, Int)])

  private def hfs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(keys: Seq[String], n: Int) =
    pmod(hash(keys.map(col): _*), lit(n))

  // ---- manifest codec (hand-rolled JSON, mirrors Verify's escaping) ----

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def render(m: Manifest): String =
    s"""{"version":${m.version},"keys":[${m.keys.map(jq).mkString(",")}],""" +
      s""""num_buckets":${m.numBuckets},"schema_ddl":${jq(m.schemaDdl)},""" +
      s""""files":[${m.files.map { case (p, b) =>
        s"""{"path":${jq(p)},"bucket":$b}""" }.mkString(",")}]}"""

  /** Minimal recursive-descent parse of [[render]]'s own output — no JSON
    * library in the dependency budget, and the grammar here is fixed.
    */
  private def parse(s: String): Manifest = {
    def strField(name: String): String = {
      val at = s.indexOf("\"" + name + "\":")
      require(at >= 0, s"manifest: missing $name")
      val sb = new StringBuilder
      var i = s.indexOf('"', at + name.length + 3) + 1
      while (s(i) != '"') {
        if (s(i) == '\\') { i += 1
          sb.append(s(i) match {
            case 'n' => '\n'
            case 'u' => val c = Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4; c
            case c => c
          })
        } else sb.append(s(i))
        i += 1
      }
      sb.toString
    }
    def longField(name: String): Long = {
      val at = s.indexOf("\"" + name + "\":")
      require(at >= 0, s"manifest: missing $name")
      s.drop(at + name.length + 3).takeWhile(c => c.isDigit || c == '-').toLong
    }
    val keys = {
      val at = s.indexOf("\"keys\":[")
      val end = s.indexOf(']', at)
      s.substring(at + 8, end).split(",").filter(_.nonEmpty)
        .map(k => k.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    }
    val files = {
      val at = s.indexOf("\"files\":[")
      val body = s.substring(at + 9, s.lastIndexOf(']'))
      "\\{\"path\":\"((?:[^\"\\\\]|\\\\.)*)\",\"bucket\":(\\d+)\\}".r
        .findAllMatchIn(body)
        .map(m => (m.group(1).replace("\\\\", "\u0000").replace("\\\"", "\"")
          .replace("\u0000", "\\"), m.group(2).toInt))
        .toSeq
    }
    Manifest(longField("version"), keys, longField("num_buckets").toInt,
      strField("schema_ddl"), files)
  }

  private[graft] def versions(fs: FileSystem, root: String): Seq[Long] = {
    val d = new Path(root, "_versions")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).iterator.map(_.getPath.getName)
      .collect { case n if n.endsWith(".json") &&
        n.dropRight(5).forall(_.isDigit) => n.dropRight(5).toLong }
      .toSeq.sorted
  }

  private[graft] def manifest(spark: SparkSession, root: String,
      version: Option[Long] = None): Manifest = {
    val fs = hfs(spark, root)
    val vs = versions(fs, root)
    require(vs.nonEmpty, s"no LakeTable at $root")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in $vs at $root")
    val in = fs.open(new Path(root, s"_versions/$v.json"))
    try parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Publish `m` as the next version. The manifest is staged as a dot-file
    * and RENAMED in — the one atomic commit point of every write path.
    */
  private def publish(fs: FileSystem, root: String, m: Manifest): Unit = {
    val dir = new Path(root, "_versions")
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val staged = new Path(dir, s".staging-${java.util.UUID.randomUUID}")
    val out = fs.create(staged, false)
    try out.write(render(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, s"${m.version}.json")
    if (!fs.rename(staged, dst)) {
      fs.delete(staged, false)
      throw new java.io.IOException(s"manifest publish lost the race to $dst")
    }
  }

  /** Write `rows` bucketed under a fresh UUID data dir; returns manifest
    * entries (root-relative path, bucket). Files only become live when a
    * manifest referencing them is published.
    */
  private def writeFiles(spark: SparkSession, root: String, rows: DataFrame,
      keys: Seq[String], numBuckets: Int): Seq[(String, Int)] = {
    val fs = hfs(spark, root)
    val sub = s"data/${java.util.UUID.randomUUID}"
    rows.withColumn("__bucket", bucketOf(keys, numBuckets))
      .repartition(col("__bucket"))
      .write.partitionBy("__bucket").mode("overwrite")
      .parquet(new Path(root, sub).toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    for (d <- fs.listStatus(new Path(root, sub))
         if d.getPath.getName.startsWith("__bucket=")) {
      val b = d.getPath.getName.stripPrefix("__bucket=").toInt
      for (f <- fs.listStatus(d.getPath)
           if f.getPath.getName.endsWith(".parquet"))
        out += ((s"$sub/${d.getPath.getName}/${f.getPath.getName}", b))
    }
    out.toSeq
  }

  private def readFiles(spark: SparkSession, root: String, m: Manifest,
      paths: Seq[String]): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else spark.read.schema(schema)
      .parquet(paths.map(p => new Path(root, p).toString): _*)
  }

  /** Create the table at `root` (version 0) from `df`, keyed and bucketed.
    * Keys must uniquely identify rows for merge semantics to be sane;
    * incoming duplicates are resolved by [[Merge.upsert]]'s tiebreak.
    */
  def init(df: DataFrame, root: String, keys: Seq[String],
      numBuckets: Int = 64): Unit = {
    require(keys.nonEmpty, "keys must be non-empty")
    val spark = df.sparkSession
    val fs = hfs(spark, root)
    require(versions(fs, root).isEmpty, s"LakeTable already exists at $root")
    val files = writeFiles(spark, root, df, keys, numBuckets)
    publish(fs, root, Manifest(0L, keys, numBuckets, df.schema.toDDL, files))
  }

  /** Read a version (default: newest) as an explicit-file-list DataFrame. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val m = manifest(spark, root, version)
    readFiles(spark, root, m, m.files.map(_._1))
  }

  /** Upsert `source` (last-writer-wins on the table keys, ties broken by
    * `orderCol` then a full-row hash — see [[Merge.upsert]]). Only the
    * buckets containing source keys are read and rewritten; everything
    * else is carried into the new manifest untouched.
    */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      orderCol: Option[String] = None): Long =
    rewriteTouched(spark, root, source,
      (cur, src) => Merge.upsert(cur, src, manifest(spark, root).keys, orderCol))

  /** Delete every row whose key appears in `keysToDelete` (extra columns
    * ignored). Same touched-bucket copy-on-write as [[merge]].
    */
  def delete(spark: SparkSession, root: String, keysToDelete: DataFrame): Long = {
    val keys = manifest(spark, root).keys
    rewriteTouched(spark, root, keysToDelete.select(keys.map(col): _*),
      (cur, del) => cur.join(del.dropDuplicates(keys), keys, "left_anti"))
  }

  private def rewriteTouched(spark: SparkSession, root: String,
      source: DataFrame, apply: (DataFrame, DataFrame) => DataFrame): Long = {
    val fs = hfs(spark, root)
    val m = manifest(spark, root)
    // bounded driver collect: at most numBuckets ints
    val touched = source.select(bucketOf(m.keys, m.numBuckets).alias("__b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val (hot, cold) = m.files.partition { case (_, b) => touched(b) }
    val merged = apply(readFiles(spark, root, m, hot.map(_._1)), source)
    val fresh = writeFiles(spark, root, merged, m.keys, m.numBuckets)
    val next = m.copy(version = m.version + 1, files = cold ++ fresh)
    publish(fs, root, next)
    next.version
  }

  /** Keep the newest `keepLast` manifests; delete older manifests and every
    * data file no kept manifest references. UUID data dirs left empty (and
    * crash-orphaned dirs older than the oldest kept manifest's files) are
    * removed.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = hfs(spark, root)
    val vs = versions(fs, root)
    val drop = vs.dropRight(keepLast)
    val keep = vs.takeRight(keepLast)
    val live = keep.flatMap(v => manifest(spark, root, Some(v)).files.map(_._1)).toSet
    val dataDir = new Path(root, "data")
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(dataDir)) {
      for (sub <- fs.listStatus(dataDir); bd <- fs.listStatus(sub.getPath)
           if bd.getPath.getName.startsWith("__bucket=");
           f <- fs.listStatus(bd.getPath)) {
        val rel = s"data/${sub.getPath.getName}/${bd.getPath.getName}/${f.getPath.getName}"
        if (!live(rel) && f.getPath.getName.endsWith(".parquet")) {
          fs.delete(f.getPath, false); removed += rel
        }
      }
      // prune dirs emptied of parquet files (metadata stragglers included)
      for (sub <- fs.listStatus(dataDir)) {
        val left = fs.listStatus(sub.getPath).flatMap {
          case d if d.isDirectory => fs.listStatus(d.getPath).toSeq
          case f => Seq(f)
        }
        if (!left.exists(_.getPath.getName.endsWith(".parquet")))
          fs.delete(sub.getPath, true)
      }
    }
    drop.foreach(v => fs.delete(new Path(root, s"_versions/$v.json"), false))
    removed.toSeq
  }
}
