package graft

import graft.sinks.LakeTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Metadata-plane scale proof (r12): measure what one commit WRITES and
  * what one scan PARSES as the table's live file count grows across two
  * decades — the falsifiable form of the segment-plane claim that commits
  * are O(delta files + live segments) metadata bytes and plans are
  * O(unseen segments) parse work, never O(live files).
  *
  * Per file-count decade F (files ≈ rows / maxRecordsPerFile):
  *  - `table_meta_bytes`: total metadata on disk (every segment file +
  *    the head manifest) — what the PRE-r12 design re-serialized on
  *    every commit and re-parsed on every scan.
  *  - `merge_commit`: a single-bucket delivery's commit — the bytes of
  *    the ONE new segment plus the new manifest, and the fresh-file
  *    count it covers. Claim: bytes scale with the fresh files (CoW
  *    rewrites one bucket), not with F; bytes/fresh-file ≈ flat.
  *  - `mor_commit`: a MoR delete — a metadata-only commit; claim: bytes
  *    ≈ manifest size ≈ O(live segments), flat across decades.
  *  - `plan_cold_ms` / `plan_warm_ms`: wall time to resolve the head
  *    manifest and run a pruned `scan(...)` through the planner with an
  *    empty segment cache (first plan ever on this driver) vs a warm
  *    one (the steady state — every segment already parsed; only the
  *    commit's own delta would be new).
  *
  * Emits one JSON line for `tools/assemble_scaleproof.py --legs
  * lake_meta_legs=...`. Run: `SPARK_GRAFT_META_OUT=/tmp/meta.json sbt
  * "runMain graft.MetaScale"`.
  */
object MetaScale {

  private def dirBytes(spark: SparkSession, root: String,
      sub: String): Long = {
    val d = new Path(root, sub)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) 0L
    else fs.listStatus(d).map(_.getLen).sum
  }

  private def fileBytes(spark: SparkSession, root: String,
      rel: String): Long = {
    val p = new Path(root, rel)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  def main(args: Array[String]): Unit = {
    val outPath = sys.env.getOrElse("SPARK_GRAFT_META_OUT", "metascale_out.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perFile = 128L
    // bucket count scales with the table so per-bucket file count stays
    // executor-sized across decades (the production layout contract —
    // [[graft.sinks.LakeTable.rebucket]] exists exactly for this): the
    // one-bucket delivery below then touches a CONSTANT-sized bucket,
    // and the driver columns isolate the metadata plane instead of a
    // deliberately overgrown bucket's data-plane rewrite.
    def bucketsFor(targetFiles: Int): Int = math.max(32, targetFiles / 64)

    // the commit runs on THIS thread (Spark job work lands on executor
    // pool threads, local mode included), so the calling thread's wall
    // clock + allocated bytes isolate the DRIVER-side commit cost — the
    // O(live files) survivor scan the r13 delta commit removed would show
    // here as a column growing with F
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    tmx.setThreadCpuTimeEnabled(true)
    def measured[T](body: => T): (T, Double, Long) = {
      val tid = Thread.currentThread.getId
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val c0 = tmx.getThreadCpuTime(tid)
      val r = body
      // CPU, not wall: while the commit waits on the bucket-rewrite JOB
      // (data-plane, O(bucket) by design) this thread accrues no CPU —
      // what's left is the driver-side metadata work under test
      ((r, (tmx.getThreadCpuTime(tid) - c0) / 1e6,
        tmx.getThreadAllocatedBytes(tid) - a0))
    }

    val decades = Seq(64, 640, 6400, 64000).map { targetFiles =>
      val buckets = bucketsFor(targetFiles)
      val rows = targetFiles * perFile
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-metascale-$targetFiles").toString
      val df = spark.range(rows).select(
        col("id"),
        (col("id") % 1000).cast("double").alias("v"),
        concat(lit("t"), col("id")).alias("tag"))
      LakeTable.init(df, root, Seq("id"), numBuckets = buckets,
        sortCols = Seq("v"), statsCols = Seq("v", "id"),
        bloomCols = Seq("tag"), ndvCols = Seq("tag"),
        maxRecordsPerFile = perFile)
      val files0 = LakeTable.manifest(spark, root).fileCount
      val segs0 = {
        val d = new Path(root, "_segments")
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(d).map(s => s.getPath.getName -> s.getLen).toMap
      }

      // one-bucket delivery: 64 existing keys that all hash to bucket 0,
      // so the CoW delta is exactly one bucket's rewrite
      val inB0 = spark.range(rows)
        .select(col("id"), pmod(hash(col("id")), lit(buckets)).alias("b"))
        .filter(col("b") === 0).limit(64).select(col("id"),
          lit(-1.0).alias("v"), lit("fresh").alias("tag"))
        .localCheckpoint() // pin the delta: the merge times the COMMIT,
                           // not this derivation
      val (_, mergeCpuMs, mergeAllocBytes) =
        measured(LakeTable.merge(spark, root, inB0))
      val m1 = LakeTable.manifest(spark, root)
      val segs1 = {
        val d = new Path(root, "_segments")
        val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(d).map(s => s.getPath.getName -> s.getLen).toMap
      }
      val newSegBytes = (segs1 -- segs0.keys).values.sum
      val manifestBytes = fileBytes(spark, root, s"_versions/${m1.version}.json")
      val freshFiles = (segs1 -- segs0.keys).keys.toSeq match {
        case Seq(one) => m1.segments.find(_.path.endsWith(one)).map(_.files)
          .getOrElse(-1)
        case _ => -1
      }

      // NDV ask (r15): fold the per-ref merged sketches — O(refs) driver
      // work, zero segment parses, zero Spark jobs. Runs BEFORE the MoR
      // delete (outstanding vectors make fastNdv decline by design).
      // Claim: flat-ish across decades (refs grow /64/4096 ≈ slowly),
      // never O(live files).
      val (ndvVal, ndvCpuMs, ndvAllocBytes) =
        measured(LakeTable.fastNdv(spark, root, "tag"))
      require(ndvVal.nonEmpty && LakeTable.lastNdvRefs.exists(_._2 == 0),
        s"ndv ask fell off the ref path: $ndvVal ${LakeTable.lastNdvRefs}")

      // metadata-only commit: MoR delete of 10 keys
      LakeTable.deleteMor(spark, root,
        spark.range(10).select(col("id")))
      val m2 = LakeTable.manifest(spark, root)
      val morManifestBytes =
        fileBytes(spark, root, s"_versions/${m2.version}.json")

      // plan-time: resolve + plan a pruned scan. Cold = empty segment
      // cache (a brand-new driver); warm = steady state.
      def planOnce(): Unit = {
        val d = LakeTable.scan(spark, root).filter(col("v") === 7.0)
        d.queryExecution.executedPlan.execute() // plan + listFiles, no job
        ()
      }
      LakeTable.clearSegmentCache()
      val t0 = System.nanoTime(); planOnce()
      val cold = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime(); planOnce()
      val warm = (System.nanoTime() - t1) / 1e6

      val tableMetaBytes = dirBytes(spark, root, "_segments") + manifestBytes

      // vacuum (r15): the manifest walk is O(keep window) — pinned by
      // lastVacuumManifestReads — but reclamation LISTS every data dir:
      // declared O(table) maintenance, priced here. grace=0 so the
      // listing + delete actually run (no writer is in flight).
      spark.sparkContext.hadoopConfiguration
        .setLong("graft.lake.vacuumGraceMs", 0L)
      val vt0 = System.nanoTime()
      val ((vacRemoved, vacWalked), vacCpuMs, _) = measured {
        val r = LakeTable.vacuum(spark, root, keepLast = 1)
        (r.size, LakeTable.lastVacuumManifestReads.getOrElse(-1))
      }
      val vacWallMs = (System.nanoTime() - vt0) / 1e6

      System.err.println(f"[meta] F=$files0%6d newSeg=$newSegBytes%9d " +
        f"manifest=$manifestBytes%7d mor=$morManifestBytes%7d " +
        f"fresh=$freshFiles%4d table=$tableMetaBytes%10d " +
        f"cold=$cold%8.1fms warm=$warm%8.1fms " +
        f"mergeCpu=$mergeCpuMs%8.1fms mergeAllocMB=${mergeAllocBytes / 1e6}%7.1f " +
        f"ndv=${ndvVal.get}%d ndvCpu=$ndvCpuMs%6.1fms " +
        f"vacWall=$vacWallMs%8.1fms vacCpu=$vacCpuMs%8.1fms " +
        f"vacRm=$vacRemoved%5d vacReads=$vacWalked%2d")
      s"""{"files":$files0,"buckets":$buckets,""" +
        s""""table_meta_bytes":$tableMetaBytes,""" +
        s""""merge_commit":{"segment_bytes":$newSegBytes,""" +
        s""""manifest_bytes":$manifestBytes,"fresh_files":$freshFiles,""" +
        s""""driver_cpu_ms":${f"$mergeCpuMs%.1f"},""" +
        s""""driver_alloc_bytes":$mergeAllocBytes},""" +
        s""""mor_commit":{"manifest_bytes":$morManifestBytes},""" +
        s""""ndv_ask":{"estimate":${ndvVal.get},""" +
        s""""driver_cpu_ms":${f"$ndvCpuMs%.1f"},""" +
        s""""driver_alloc_bytes":$ndvAllocBytes},""" +
        s""""vacuum":{"wall_ms":${f"$vacWallMs%.1f"},""" +
        s""""driver_cpu_ms":${f"$vacCpuMs%.1f"},""" +
        s""""removed_files":$vacRemoved,"manifest_reads":$vacWalked},""" +
        s""""plan_cold_ms":${f"$cold%.1f"},"plan_warm_ms":${f"$warm%.1f"}}"""
    }
    val json = s"""{"metric":"lake_meta_commit_bytes",""" +
      s""""per_file_rows":$perFile,"decades":[${decades.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
