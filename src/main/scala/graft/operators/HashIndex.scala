package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted banded-Hamming hash index — the modality-agnostic incremental
  * dedup state behind every 64-bit perceptual fingerprint in the engine
  * (image dHash from [[Multimodal.imageHashes]], video frame hashes from
  * [[Multimodal.videoFrames]], audio envelopes from
  * [[Multimodal.audioHashes]]): the multimodal twin of the MinHash
  * signature index (`Dedup.persistNearDupIndex`), with the same lake
  * posture.
  *
  *  - `path/hashes`: (id, dhash) — dedup-on-write on id, so redelivery is
  *    idempotent and the band join never fans out duplicate rows.
  *  - `path/bands`: (id, dhash, __band, __v) — the 8-way byte-band table
  *    precomputed ONCE at write from the just-published hashes. A probe
  *    equi-joins these ~18-byte rows; history is never re-banded.
  *
  * Both tables publish via stage-and-swap ([[graft.sinks.LakeSink]]): an
  * append whose lineage reads this same path sees the old fileset for its
  * whole job, and a crash leaves the previous version intact.
  *
  * 100 TB posture: probe cost = delta band rows × matching buckets, an
  * equi-join with no all-pairs term; append cost = the delta encode plus
  * an id anti-join. Payload bytes (pixels, samples) never enter the index.
  */
object HashIndex {

  final case class Loaded(hashes: DataFrame, bands: DataFrame)

  /** 8 byte-bands per hash: any pair within Hamming 7 agrees exactly on at
    * least one band (pigeonhole), so band equality is a complete candidate
    * generator for `maxHamming` ≤ 7.
    */
  private def bandRows(df: DataFrame): DataFrame =
    df.select(col("id"), col("dhash"),
      explode(array((0 until 8).map(i =>
        struct(lit(i).alias("__band"),
          shiftright(col("dhash"), 8 * i).bitwiseAND(lit(0xffL)).alias("__v"))): _*))
        .alias("b"))
      .select(col("id"), col("dhash"), col("b.__band"), col("b.__v"))

  /** Publish an index from (id, dhash) rows: null hashes dropped (an
    * undecodable payload can never match anything), ids dedup'd, bands
    * derived from the published hashes so the two tables cannot disagree.
    */
  def persist(index: DataFrame, path: String): Unit = {
    require(index.columns.sameElements(Array("id", "dhash")),
      s"index must have columns (id, dhash), got ${index.columns.mkString(",")}")
    val spark = index.sparkSession
    val hashesDir = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val bandsDir  = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = hashesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.LakeSink.stageAndSwap(fs, hashesDir) { staging =>
      index.filter(col("dhash").isNotNull).dropDuplicates("id")
        .write.mode("overwrite").parquet(staging.toString)
    }
    spark.catalog.refreshByPath(hashesDir.toString) // rename-swap bypasses cache invalidation
    val published = spark.read.parquet(hashesDir.toString)
    graft.sinks.LakeSink.stageAndSwap(fs, bandsDir) { staging =>
      bandRows(published).write.mode("overwrite").parquet(staging.toString)
    }
    spark.catalog.refreshByPath(bandsDir.toString)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): Loaded =
    Loaded(
      spark.read.parquet(s"$path/hashes").select(col("id"), col("dhash")),
      spark.read.parquet(s"$path/bands")
        .select(col("id"), col("dhash"), col("__band"), col("__v")))

  /** Probe a delivery against the index: (id, matched_id, hamming) for
    * every delta id within `maxHamming` of an INDEXED id. A redelivered id
    * matches its own indexed row (hamming 0) — an index membership probe,
    * not a distinct-pair miner; filter `id =!= matched_id` for the latter.
    */
  def probe(idx: Loaded, delta: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"8 byte-bands guarantee recall only for maxHamming < 8, got $maxHamming")
    val d = bandRows(delta.filter(col("dhash").isNotNull).dropDuplicates("id"))
      .select(col("id"), col("dhash").alias("__dh"), col("__band"), col("__v"))
    d.join(idx.bands.select(col("id").alias("matched_id"),
        col("dhash").alias("__ih"), col("__band"), col("__v")),
        Seq("__band", "__v"))
      .select(col("id"), col("matched_id"),
        bit_count(col("__dh").bitwiseXOR(col("__ih"))).cast("long").alias("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** WITHIN-SET near-dup pairs over (id, dhash) rows — the same banded
    * join as [[probe]] against the set itself: (id_a < id_b, hamming).
    * The candidate generator behind image/audio/video-frame pair mining
    * and the in-batch leg of streaming media dedup.
    */
  def pairs(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"8 byte-bands guarantee recall only for maxHamming < 8, got $maxHamming")
    val bands = bandRows(hashes.filter(col("dhash").isNotNull))
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b,
        col("a.__band") === col("b.__band") && col("a.__v") === col("b.__v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").alias("id_a"), col("b.id").alias("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("long")
          .alias("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Append a delivery's (id, dhash) rows: ids already indexed are dropped
    * (idempotent redelivery), both tables republished via stage-and-swap —
    * the union job reads the OLD fileset, so appending over the index's own
    * read path cannot delete its inputs.
    */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame): Unit = {
    val idx = read(spark, path)
    val fresh = delta.filter(col("dhash").isNotNull).dropDuplicates("id")
      .join(idx.hashes.select("id"), Seq("id"), "left_anti")
    val merged = idx.hashes.unionByName(fresh)
    val hashesDir = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val bandsDir  = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = hashesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.LakeSink.stageAndSwap(fs, hashesDir) { staging =>
      merged.write.mode("overwrite").parquet(staging.toString)
    }
    spark.catalog.refreshByPath(hashesDir.toString) // rename-swap bypasses cache invalidation
    val published = spark.read.parquet(hashesDir.toString)
    graft.sinks.LakeSink.stageAndSwap(fs, bandsDir) { staging =>
      bandRows(published).write.mode("overwrite").parquet(staging.toString)
    }
    spark.catalog.refreshByPath(bandsDir.toString)
  }
}
