package graft.operators

import graft.functions.{TextFunctions, VectorFunctions, VectorKernels}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale discipline: every approximate path is *bucketed* — candidate pairs
  * come from equi-joins on band/bucket keys (shuffle on the bucket hash),
  * never from an all-pairs cartesian. Exact verification (Jaccard / cosine)
  * runs only inside buckets. This is the standard shingle→minhash→band→
  * bucket-join construction (Broder; Leskovec et al., "Mining of Massive
  * Datasets" ch. 3).
  */
object Dedup {

  /** Exact dedup on explicit keys — plain `dropDuplicates`, one hash
    * exchange on the keys.
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame = df.dropDuplicates(keys)

  /** Exact content dedup via fingerprint: keep one row per distinct md5 of
    * the (normalized) content column. Shuffles 16-byte digests, not
    * documents.
    */
  def exactByContent(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__fp", md5(lower(trim(col(textCol)))))
      .dropDuplicates("__fp")
      .drop("__fp")

  /** Exact content dedup with a DETERMINISTIC survivor: the minimum id per
    * fingerprint. `dropDuplicates` keeps whichever row the shuffle delivers
    * first — fine for cardinality, wrong for reproducible corpus curation.
    * Planned as `min_by(struct(row), id)` — a partial+final hash aggregate
    * with map-side combine, not a sort window: the shuffle carries one
    * surviving row per (partition, fingerprint) and nothing ever sorts.
    */
  def exactByContentKeepMin(df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    val cols = df.columns.toSeq
    df.withColumn("__fp", md5(lower(trim(col(textCol)))))
      .groupBy(col("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).alias("__row"))
      .select(cols.map(c => col(s"__row.$c").alias(c)): _*)
  }

  /** [[exactByContentKeepMin]] keeping the BEST-scoring duplicate instead of
    * the lowest id — quality-aware survivor selection (when twins differ in
    * envelope metadata — source, crawl date, extraction quality — keep the
    * best copy, the Gopher / FineWeb practice). Deterministic: ties on
    * `scoreCol` break to the LOWEST id. Same shape as keep-min: one
    * partial+final hash aggregate, one surviving row per (partition,
    * fingerprint) across the shuffle, no sort.
    */
  def exactByContentKeepBest(df: DataFrame, idCol: String, scoreCol: String,
      textCol: String = "text"): DataFrame = {
    val cols = df.columns.toSeq
    df.withColumn("__fp", md5(lower(trim(col(textCol)))))
      .groupBy(col("__fp"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(scoreCol), negate(col(idCol)))).alias("__row"))
      .select(cols.map(c => col(s"__row.$c").alias(c)): _*)
  }

  /** NEAR-dup removal keeping the best-scoring member of each TRANSITIVE
    * cluster (MinHash pairs → connected components → `max_by` per
    * component): the quality-aware counterpart of the funnel's keep-min
    * kill list. Docs in no near-dup pair survive untouched (component =
    * own id). Ties on `scoreCol` break to the lowest id.
    */
  def nearDupKeepBest(df: DataFrame, idCol: String, scoreCol: String,
      textCol: String = "text", numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, minJaccard: Double = 0.8,
      maxBucketSize: Int = defaultMaxBucketSize): DataFrame = {
    val cols = df.columns.toSeq
    val pairs = minhashLshPairs(df, idCol, textCol, numHashes, bands,
      shingleSize, minJaccard, maxBucketSize)
    val comps = connectedComponents(pairs)
      .select(col("id").alias(idCol), col("component"))
    df.join(comps, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
      .groupBy(col("__comp"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(scoreCol), negate(col(idCol)))).alias("__row"))
      .select(cols.map(c => col(s"__row.$c").alias(c)): _*)
  }

  /** MinHash signature column: for each of `numHashes` hash functions, the
    * min over the document's word-`shingleSize` shingles of
    * `murmur3(shingle, seed=i)`. Pure built-ins → whole-stage codegen.
    */
  def minhashSignature(textCol: Column, numHashes: Int, shingleSize: Int): Column =
    TextFunctions.minhashSig(hashedShingles(textCol, shingleSize), numHashes)

  /** MinHash + LSH near-duplicate candidate pairs with verified Jaccard.
    *
    * signature (numHashes) → `bands` bands of `numHashes/bands` rows; docs
    * agreeing on any full band meet in a bucket; bucket equi-join yields
    * candidates; exact shingle-set Jaccard filters to `minJaccard`.
    *
    * Returns `(id_a, id_b, jaccard, capped)` with `id_a < id_b` (`capped` =
    * the pair came only from an oversized bucket's star topology — see
    * [[bucketStats]]). The join key is `(band, band_hash)` so the shuffle
    * is uniform; no cartesian anywhere.
    */
  /** Hashed shingle set: distinct murmur3 of each word-`n` shingle. Jaccard
    * over the int sets equals Jaccard over the string sets up to hash
    * collisions (~n²/2³² per doc — negligible), and both the LSH shuffle and
    * the verify intersect move 4-byte ints instead of strings. Native
    * single-pass expression, so the dedup pipeline stays in codegen.
    */
  private def hashedShingles(textCol: Column, n: Int): Column =
    TextFunctions.hashedShingles(TextFunctions.tokens(textCol), n)

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Candidate pairs from a bucketed table (`__id` + bucket key columns),
    * with a hot-bucket cap: buckets of ≤ `maxBucketSize` docs emit all pairs
    * (the classic LSH construction); larger buckets emit STAR pairs to the
    * bucket's min id instead — k−1 rows, not k², so one viral document
    * duplicated 100k times can't quadratically stall the stage. Star capping
    * is lossless for the mass-duplicate case that creates hot buckets
    * (identical docs all verify against the representative, and connected
    * components restores the full cluster); what it gives up is DIRECT pair
    * coverage between near-but-not-identical members of an oversized
    * bucket. Not silent: every candidate carries `capped` (true = produced
    * by an oversized bucket's star topology), the pair operators keep the
    * column in their outputs, and [[bucketStats]] reports the flagged
    * buckets themselves.
    */
  private def cappedCandidatePairs(bucketed: DataFrame, keyCols: Seq[String],
      maxBucketSize: Int): DataFrame = {
    require(maxBucketSize > 1, "maxBucketSize must exceed 1")
    // ONE consumer of the (expensive) bucketed table: groupBy the bucket key,
    // collect the member ids, and expand pairs from the array in-task. The
    // former window+self-join formulation fed the bucket table to three
    // consumers and needed an eager localCheckpoint to avoid recomputing the
    // shingle→signature map 3× — a blocking materialization whose cold cost
    // dominated the bench. Here the signature compute feeds exactly one
    // shuffle (this groupBy) and nothing is checkpointed. Memory is no worse
    // than the window variant: a hot bucket's rows already co-resided in one
    // window partition; now they co-reside in one aggregation buffer, and
    // star capping keeps the EMITTED pairs linear in bucket size.
    val grouped = bucketed.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(col("__id"))).alias("__ids"))
    val ids = col("__ids")
    val n = size(ids)
    val pairs = when(n <= maxBucketSize,
        // all ordered pairs (id_a < id_b) of the sorted array
        flatten(transform(ids, (x, i) =>
          transform(slice(ids, i + lit(2), n),
            y => struct(x.alias("id_a"), y.alias("id_b"), lit(false).alias("capped"))))))
      .otherwise(
        // star topology: every member pairs with the bucket min
        transform(slice(ids, lit(2), n),
          y => struct(element_at(ids, 1).alias("id_a"), y.alias("id_b"),
            lit(true).alias("capped"))))
    grouped.select(explode(pairs).alias("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.capped"))
      .groupBy(col("id_a"), col("id_b"))
      // a pair met in any uncapped bucket counts as uncapped
      .agg(min(col("capped")).alias("capped"))
  }

  /** Bucket-size diagnostics for a capped LSH run: one row per bucket with
    * its size and whether it exceeds `maxBucketSize` — the "what was
    * dropped" audit for the hot-bucket cap (pair coverage inside flagged
    * buckets is star-shaped, not all-pairs).
    */
  def bucketStats(df: DataFrame, idCol: String, textCol: String = "text",
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucketSize: Int = defaultMaxBucketSize): DataFrame =
    bandedBuckets(shingleProjection(df, idCol, textCol, shingleSize), numHashes, bands)
      .groupBy(col("__band"), col("__bucket"))
      .agg(count(lit(1)).alias("bucket_size"))
      .withColumn("over_cap", col("bucket_size") > maxBucketSize)

  /** Default hot-bucket cap: all-pairs inside a 256-doc bucket is ~32k
    * candidate rows — safely within a task; beyond that the quadratic term
    * dominates and star capping takes over.
    */
  val defaultMaxBucketSize: Int = 256

  /** Candidate id-pairs → verified pairs: re-attach each side's shingle set
    * by id and keep pairs with Jaccard ≥ `minJaccard`. The joins shuffle the
    * (small) candidate set and the per-doc shingle sets once each — the
    * band/bucket join itself never carries document payloads.
    */
  private def verifyJaccard(candidates: DataFrame, withSh: DataFrame,
      minJaccard: Double): DataFrame =
    candidates
      .join(withSh.select(col("__id").alias("id_a"), col("__sh").alias("sh_a")), Seq("id_a"))
      .join(withSh.select(col("__id").alias("id_b"), col("__sh").alias("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).alias("jaccard"),
        col("capped"))
      .filter(col("jaccard") >= minJaccard)

  /** Hashed-shingle projection `(__id, __sh)` — the one expensive text pass
    * behind MinHash dedup. Callers composing several shingle consumers (LSH
    * banding + Jaccard verify, or a multi-stage curation funnel) should
    * compute this ONCE, `persist` it, and feed it to
    * [[minhashLshPairsFromShingles]]: re-deriving it per consumer multiplies
    * the dominant tokenize+hash cost at corpus scale.
    */
  def shingleProjection(df: DataFrame, idCol: String, textCol: String = "text",
      shingleSize: Int = 3): DataFrame =
    df.select(col(idCol).alias("__id"),
      hashedShingles(col(textCol), shingleSize).alias("__sh"))

  /** (id, band, bucket) rows for the banded-LSH join, derived from a shingle
    * projection. Banded rows carry ONLY (id, band, bucket): at scale the LSH
    * shuffle is `bands` 12-byte rows per doc, not `bands` copies of the
    * shingle set.
    */
  private[operators] def bandedBuckets(withSh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Null/short texts (empty shingle set) are EXCLUDED from banding: they
    // all share the degenerate all-MaxValue signature, so at corpus scale
    // they form one bucket holding every contentless row — whose id list
    // must fit a single aggregation buffer in [[cappedCandidatePairs]].
    // Excluding them changes no verified output: an empty shingle set's
    // exact Jaccard is 0/0 = null on every verify path (self-join pairs and
    // cross-set decontamination alike), so their candidates were always
    // filtered out after the shuffle anyway.
    withSh.filter(size(col("__sh")) > 0)
      .select(col("__id"),
        TextFunctions.minhashSig(col("__sh"), numHashes).alias("__sig"))
      .select(
        col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("__sig"), b * rows + 1, lit(rows))))).as(Seq("__band", "__bucket")))
  }

  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      minJaccard: Double = 0.8,
      maxBucketSize: Int = defaultMaxBucketSize
  ): DataFrame =
    minhashLshPairsFromShingles(
      shingleProjection(df, idCol, textCol, shingleSize),
      numHashes, bands, minJaccard, maxBucketSize)

  /** [[minhashLshPairs]] over a precomputed [[shingleProjection]]
    * (`__id`, `__sh`). The projection is consumed by BOTH the band-bucket
    * derivation and the Jaccard verify joins — persist it at the call site
    * so the corpus is shingled exactly once per curation run.
    */
  def minhashLshPairsFromShingles(
      withSh: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.8,
      maxBucketSize: Int = defaultMaxBucketSize
  ): DataFrame = {
    val candidates = cappedCandidatePairs(bandedBuckets(withSh, numHashes, bands),
      Seq("__band", "__bucket"), maxBucketSize)
    verifyJaccard(candidates, withSh, minJaccard)
  }

  /** Result of an [[incrementalNearDup]] run: accepted batch rows and the
    * signature index to persist for the next batch.
    */
  final case class IncrementalNearDupResult(accepted: DataFrame, updatedIndex: DataFrame)

  /** Incremental NEAR-dup dedup — the [[incremental]] shape for
    * paraphrase-level duplicates: curate a new batch against a persisted
    * MinHash SIGNATURE index of everything already accepted, without
    * rescanning (or even storing) historical text. The index holds
    * (`id`, `sig`) — `numHashes` ints per doc (256 B at 64 hashes; a
    * 10 B-doc history is ~2.5 TB, object-store cheap) — and signatures are
    * enough for both candidate banding AND similarity estimation, so
    * historical shingle sets are never needed again.
    *
    * Construction: batch docs shingle+sign once; batch bands equi-join the
    * index's bands (uniform hash buckets — same shuffle shape as every LSH
    * path here); candidate similarity is the SIGNATURE-AGREEMENT estimate
    * (fraction of equal positions — the unbiased MinHash Jaccard
    * estimator, ±1/√numHashes), so the verdict costs one zip_with over two
    * int arrays instead of a text re-shingle. A batch doc is rejected when
    * any index doc estimates ≥ `minEstJaccard`; within the batch itself,
    * any doc with a SMALLER near-dup batch-mate is dropped (greedy
    * pairwise rule — deterministic, chain-safe for the mass-duplicate
    * case; it can keep one more survivor than component-min labeling on
    * sparse chains, documented tradeoff for not running components per
    * delivery).
    *
    * Threshold semantics are ESTIMATE-based: with 64 hashes the estimator's
    * σ ≈ 0.05 near J = 0.6 — set `minEstJaccard` with that slack in mind
    * (or raise `numHashes`, linearly shrinking both index bytes/doc σ²).
    * Null/short texts share the degenerate all-MaxValue signature and
    * near-dup each other — same conflation as [[incremental]]'s empty-fp.
    */
  /** (outId, __band, __bucket) rows of a signature frame — the LSH probe
    * table derived from (id, sig): one 4-byte bucket hash per band, per doc.
    */
  private def sigBands(df: DataFrame, idc: String, sigc: String, outId: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    df.select(col(idc).alias(outId),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col(sigc), b * rows + 1, lit(rows)))))
        .as(Seq("__band", "__bucket")))
  }

  def incrementalNearDup(batch: DataFrame, index: DataFrame, idCol: String,
      textCol: String = "text", numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, minEstJaccard: Double = 0.6,
      indexBands: Option[DataFrame] = None): IncrementalNearDupResult = {
    require(index.columns.sameElements(Array("id", "sig")),
      s"index must have columns (id, sig), got ${index.columns.mkString(",")}")
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(minEstJaccard > 0 && minEstJaccard <= 1, "minEstJaccard in (0,1]")
    def bandsOf(df: DataFrame, idc: String, sigc: String, outId: String): DataFrame =
      sigBands(df, idc, sigc, outId, numHashes, bands)
    def estAgree(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / numHashes

    // LAZY local checkpoint: the probe references the batch signatures in
    // FOUR places (two band derivations, two signature-compare joins) —
    // without the cut each leg re-runs tokenize+shingle+minhash over the
    // whole delivery, and the legs all sit on one action so the caller
    // can't deduplicate the work from outside. Lazy (eager=false) so no
    // extra job runs for callers that never execute the probe.
    val batchSig = batch
      .select(col(idCol).alias("id"),
        TextFunctions.minhashSig(
          TextFunctions.hashedShingles(
            TextFunctions.tokens(col(textCol)), shingleSize), numHashes).alias("sig"))
      .localCheckpoint(false)
    // Probe side of the history join: a compacted on-disk banded table when
    // the caller persisted one ([[persistNearDupIndex]]) — O(history) IO of
    // 12-byte rows — else derived from (id, sig), O(history) band-hash
    // compute per delivery.
    val historyBands = indexBands
      .map(_.select(col("id").alias("__iid"), col("__band"), col("__bucket")))
      .getOrElse(bandsOf(index, "id", "sig", "__iid"))
    // the batch's band rows feed THREE join sides (one vs history, both
    // sides of the in-batch self-join) and every join keys on
    // (__band, __bucket) — so shuffle them into that partitioning ONCE
    // and lazily checkpoint: the checkpointed frame keeps its hash
    // partitioning, and all three join sides consume it exchange-free
    // (the self-join runs entirely co-partitioned)
    val bBands = bandsOf(batchSig, "id", "sig", "__id")
      .repartition(col("__band"), col("__bucket"))
      .localCheckpoint(false)
    val vsIndex = bBands.withColumnRenamed("__id", "__bid")
      .join(historyBands, Seq("__band", "__bucket"))
      .select(col("__bid"), col("__iid")).distinct()
      .join(batchSig.select(col("id").alias("__bid"), col("sig").alias("__bsig")), Seq("__bid"))
      .join(index.select(col("id").alias("__iid"), col("sig").alias("__isig")), Seq("__iid"))
      .filter(estAgree(col("__bsig"), col("__isig")) >= minEstJaccard)
      .select(col("__bid").alias("id"))
    val withinBatch = bBands.select(col("__id").alias("__a"), col("__band"), col("__bucket"))
      .join(bBands.select(col("__id").alias("__b"), col("__band"), col("__bucket")),
        Seq("__band", "__bucket"))
      .filter(col("__a") < col("__b"))
      .select(col("__a"), col("__b")).distinct()
      .join(batchSig.select(col("id").alias("__a"), col("sig").alias("__asig")), Seq("__a"))
      .join(batchSig.select(col("id").alias("__b"), col("sig").alias("__bsig")), Seq("__b"))
      .filter(estAgree(col("__asig"), col("__bsig")) >= minEstJaccard)
      .select(col("__b").alias("id")) // drop the larger id of each pair
    // ONE distinct over the union — per-leg distincts here were redundant
    // shuffles (the candidate-pair distincts above, which bound the
    // estAgree fan-in, stay)
    val dropIds = vsIndex.unionByName(withinBatch).distinct()
    val accepted = batch.join(dropIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
    val updatedIndex = index.unionByName(
      batchSig.join(dropIds, Seq("id"), "left_anti"))
    IncrementalNearDupResult(accepted, updatedIndex)
  }

  /** Persisted signature index read back from [[persistNearDupIndex]]:
    * `sigs` = (id, sig) for similarity estimation, `bands` = (id, __band,
    * __bucket) for the LSH probe join.
    */
  final case class NearDupIndex(sigs: DataFrame, bands: DataFrame)

  /** Compact-and-persist an [[incrementalNearDup]] signature index. The
    * returned `updatedIndex` frame is a UNION over its input lineage — fold
    * it to disk between deliveries or a year of daily batches accumulates a
    * 365-deep union plan that re-derives every historical band hash per
    * run. The layout bounds both:
    *
    *  - `path/sigs`: (id, sig), DEDUPED ON id at write — replaying a failed
    *    delivery is idempotent; the index never accumulates duplicate rows
    *    that would fan out the band join.
    *  - `path/bands`: (id, __band, __bucket) derived ONCE at write from the
    *    just-written sigs (never from the pre-dedup input, so the two files
    *    cannot disagree). Next delivery's probe join reads these 12-byte
    *    rows instead of re-hashing `bands` slices of every historical
    *    signature.
    *
    * Both tables publish via stage-and-swap ([[graft.sinks.LakeSink]]):
    * the write job runs against a staging dir and ONE rename flips it in,
    * so an `index` whose lineage READS this same path (compact-in-place,
    * the updatedIndex-over-its-own-version shape) still sees the old
    * fileset for the whole job instead of having its inputs deleted from
    * under it — and a crashed compaction leaves the previous version
    * intact, never a half-written directory.
    */
  def persistNearDupIndex(index: DataFrame, path: String,
      numHashes: Int = 64, bands: Int = 16): Unit = {
    require(index.columns.sameElements(Array("id", "sig")),
      s"index must have columns (id, sig), got ${index.columns.mkString(",")}")
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = index.sparkSession
    val sigsDir  = new org.apache.hadoop.fs.Path(s"$path/sigs")
    val bandsDir = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = sigsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.LakeSink.stageAndSwap(fs, sigsDir) { staging =>
      index.dropDuplicates("id").write.mode("overwrite").parquet(staging.toString)
    }
    val sigs = spark.read.parquet(sigsDir.toString)
    graft.sinks.LakeSink.stageAndSwap(fs, bandsDir) { staging =>
      sigBands(sigs, "id", "sig", "id", numHashes, bands)
        .write.mode("overwrite").parquet(staging.toString)
    }
  }

  /** Read a [[persistNearDupIndex]] layout; feed `.sigs` as the `index` and
    * `.bands` as `indexBands` to [[incrementalNearDup]].
    */
  def readNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): NearDupIndex =
    NearDupIndex(
      spark.read.parquet(s"$path/sigs").select(col("id"), col("sig")),
      spark.read.parquet(s"$path/bands")
        .select(col("id"), col("__band"), col("__bucket")))

  /** Newest persisted index version under `root` STRICTLY BELOW `below`
    * (directories named `v<digits>`) — the replay-safe lookup shared by the
    * streaming ingest and the scheduler DAG: a retried delivery must read
    * the index state before itself, never its own partial output.
    */
  def latestNearDupIndexVersion(spark: org.apache.spark.sql.SparkSession,
      root: String, below: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.drop(1).nonEmpty &&
        s.drop(1).forall(_.isDigit) => s.drop(1).toLong }
      .filter(_ < below).maxOption
  }

  /** Retention for batch-versioned index roots (the `root/v<id>`
    * full-snapshot convention shared by [[persistNearDupIndex]] and
    * [[graft.operators.HashIndex.persist]]): delete every version dir but
    * the newest `keepLast`. Returns the dropped version ids.
    *
    * Each published version is a COMPLETE index snapshot, so old versions
    * are pure replay horizon, not data — exactly [[graft.sinks.LakeTable
    * .vacuum]]'s tradeoff. `keepLast >= 2` is enforced because every
    * consumer (the corpus DAG's replay, a streaming ingest's crash-replay
    * of its last micro-batch) reads the newest version STRICTLY BELOW its
    * own id: with only the just-published version kept, a replay of that
    * same delivery would see an empty history and re-admit cross-delivery
    * twins.
    */
  def vacuumNearDupIndexVersions(spark: org.apache.spark.sql.SparkSession,
      root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 2,
      s"keepLast must be >= 2 (strictly-below replay safety), got $keepLast")
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val vs = fs.listStatus(p).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.drop(1).nonEmpty &&
        s.drop(1).forall(_.isDigit) => s.drop(1).toLong }
      .toSeq.sorted
    val drop = vs.dropRight(keepLast)
    drop.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v$v"), true))
    drop
  }

  /** Connected components over a near-dup pair graph (`id_a`, `id_b`) by
    * iterative min-label propagation: every node converges to the smallest
    * id reachable from it. O(diameter) rounds — near-dup clusters are
    * shallow (duplicates of duplicates), so convergence is fast; each round
    * is one shuffle on node id and lineage is cut with `localCheckpoint` so
    * the plan doesn't grow unboundedly. Returns (`id`, `component`).
    *
    * This is what turns PAIRWISE near-dup output into correct dedup: for a
    * chain A~B~C where A and C are not directly similar, pairwise removal
    * keeps A and C; component-wise keeps only A.
    */
  /** @param checkpointDir when set, per-round lineage cuts use RELIABLE
    *   `checkpoint()` into this directory (survives executor loss — required
    *   at cluster scale; set it to durable storage, e.g. an object-store
    *   path). When None, `localCheckpoint` (executor-local blocks) is used —
    *   fine single-node / small-job, but an executor loss aborts the job.
    * @param smallGraphThreshold edge-count at or below which the component
    *   labels are computed by a single driver-side union-find pass instead of
    *   the iterative distributed loop. Near-dup pair graphs are usually tiny
    *   relative to the corpus (they scale with the duplicate fraction, not
    *   the corpus), and a bounded collect beats 3–5 whole shuffle rounds of
    *   scheduling for them. The default 1M edges collects ~30-60 MB of
    *   boxed rows transiently — modest for a driver; raise it only with
    *   driver memory to match, or set 0 to force the distributed path.
    *   The fast path requires integral id columns; other id types always
    *   take the distributed loop.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val undirectedPlan = pairs.select(col("id_a").alias("src"), col("id_b").alias("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val integralIds = {
      import org.apache.spark.sql.types._
      val types = undirectedPlan.schema.fields.map(_.dataType)
      // SAME integral type on both sides: the fast path casts its output
      // back to that type, and a mixed int/long frame would otherwise
      // truncate 64-bit ids on the narrow side. Mixed or non-integral id
      // frames take the type-generic distributed loop.
      types.distinct.length == 1 && (types.head match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      })
    }
    // Small-graph fast path in ONE job: collect up to threshold+1 edges via
    // limit (not count-then-collect — that was three job rounds including a
    // checkpoint materialization). If the limit row arrives, the graph is
    // big: fall through to the distributed loop, whose one recomputation of
    // the edge plan is noise next to its O(log diameter) shuffle rounds.
    if (integralIds && smallGraphThreshold > 0) {
      val cap = math.min(smallGraphThreshold, (Int.MaxValue - 1).toLong).toInt
      val sample = undirectedPlan.limit(cap + 1).collect()
      if (sample.length <= cap)
        return smallGraphComponents(sample, undirectedPlan.schema.fields.head.dataType, spark)
    }
    val undirected = cut(undirectedPlan)
    // Edges are re-joined every round on dst: pre-hash-partition on dst and
    // persist, so each round reuses the cached layout instead of re-shuffling
    // the edge table (the per-round exchange is then labels-only).
    val edges = cut(undirected
      .unionByName(undirected.select(col("dst").alias("src"), col("src").alias("dst")))
      .repartition(col("dst")))
    // init = min(self, min direct neighbor): fuses the first propagation
    // round into label construction (one fewer checkpoint+count round)
    var labels = cut(edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).alias("component"))
      .select(col("src").alias("id"), col("component")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // One-hop: each node adopts min(own component, neighbors' components).
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").alias("id"))
        .agg(min(col("component")).alias("__nc"))
      // Two-hop pointer doubling: follow the label's own label
      // (component values are node ids), so chains contract exponentially —
      // O(log diameter) rounds instead of O(diameter). Labels only ever
      // point at reachable ids, so doubling preserves correctness.
      val viaDouble = labels.alias("l1")
        .join(labels.alias("l2"), col("l1.component") === col("l2.id"), "left")
        .select(col("l1.id").alias("id"),
          col("l2.component").alias("__dc"))
      // keep the previous label in the same frame: change detection is then
      // a filter-count on the checkpointed result, not another join action
      val updated = cut(labels.join(viaNeighbors, Seq("id"), "left")
        .join(viaDouble, Seq("id"), "left")
        .select(col("id"), col("component").alias("__prev"),
          least(col("component"),
            least(coalesce(col("__nc"), col("component")),
              coalesce(col("__dc"), col("component"))))
            .alias("component")))
      val changed = updated.filter(col("__prev") =!= col("component")).count()
      labels.unpersist() // superseded checkpoint — don't stack maxIter copies
      labels = updated.drop("__prev")
      converged = changed == 0L
      i += 1
    }
    edges.unpersist()
    // Fail loudly: silently returning partial labels would let duplicate
    // cluster members survive dedup with no signal anywhere downstream.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "pair-graph diameter exceeds maxIter; raise it")
    labels
  }

  /** Driver union-find for pair graphs under `smallGraphThreshold`: union by
    * MIN root with path compression, so each tree's root is the component's
    * minimum id — identical labels to the distributed min-propagation loop.
    * Operates on the already-collected edge rows (bounded by the caller's
    * threshold, ≈64 MB at default).
    */
  private def smallGraphComponents(edges: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // ids verified integral by the caller; normalize int/short ids to long
    edges.foreach { row =>
      val a = row.get(0).asInstanceOf[Number].longValue
      val b = row.get(1).asInstanceOf[Number].longValue
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    import spark.implicits._
    parent.keys.toSeq.sorted.map(id => (id, find(id))).toDF("id", "component")
      // keep the caller's id type — both paths must agree on output schema
      .select(col("id").cast(idType).alias("id"),
        col("component").cast(idType).alias("component"))
  }

  /** Result of an [[incremental]] run: the batch rows that survived (new
    * content), and the updated fingerprint index to persist for the next
    * batch.
    */
  final case class IncrementalResult(accepted: DataFrame, updatedIndex: DataFrame)

  /** Incremental dedup: curate a NEW batch against the fingerprint index of
    * everything already accepted — the shape of a continuously-ingesting
    * corpus (each crawl/delivery dedups against all prior deliveries
    * without rescanning them).
    *
    * The index is one `fp` column (md5 of normalized content): 16 bytes per
    * historical doc, so a 10-billion-doc history is a ~300 GB table — a
    * cheap anti-join side at 100 TB corpus scale, and the only thing the
    * nightly job re-reads. Within-batch duplicates collapse first
    * (deterministic min-id survivor), then the anti-join drops content seen
    * in any earlier batch. Persist `updatedIndex` (bucketed by `fp` to make
    * the next run's anti-join co-located) and feed it to the next call.
    *
    * Null content fingerprints as the empty string (documented conflation):
    * a NULL fp would never equal itself in the anti-join, so a null-text
    * doc would be re-accepted on every rerun — silently breaking
    * idempotency.
    */
  def incremental(batch: DataFrame, index: DataFrame, idCol: String,
      textCol: String = "text"): IncrementalResult = {
    requireIndexSchema(index)
    val withFp = fingerprintAndCollapse(batch, idCol, textCol)
    val accepted = withFp
      .join(index, withFp("__fp") === index("fp"), "left_anti")
    val updatedIndex = index
      .unionByName(accepted.select(col("__fp").alias("fp")))
      .distinct()
    IncrementalResult(accepted.drop("__fp"), updatedIndex)
  }

  /** Cross-corpus overlap ESTIMATE from HLL sketch algebra — "how much of
    * crawl B is already in corpus A" answered WITHOUT the join: by
    * inclusion–exclusion, |A∩B| ≈ est(A) + est(B) − est(A∪B), and all
    * three estimates come from ONE shared scan of the tagged union (the
    * conditional-input trick: each row updates its source's sketch and the
    * union sketch). At 100 TB this is the triage step before committing to
    * a full incremental-dedup run: three HLL buffers (4 KB each at p=12)
    * cross the final merge, nothing else.
    *
    * Standard-error intuition: each estimate carries ~1.04/√2ᵖ relative
    * error on ITS cardinality, so the overlap's absolute error is a few
    * multiples of 1 % of |A∪B| — meaningful when the overlap is a
    * substantial fraction of the union, useless for needle-sized overlaps
    * (use [[incrementalBloom]] + a count for those).
    *
    * Returns one row: (`est_a`, `est_b`, `est_union`, `est_overlap`),
    * overlap clamped at 0.
    */
  def sketchOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      p: Int = 12): DataFrame = {
    val hll = udaf(new graft.functions.Aggregators.HyperLogLog(p))
    val tagged = a.select(col(keyCol).cast("string").alias("__k"), lit("a").alias("__src"))
      .unionByName(
        b.select(col(keyCol).cast("string").alias("__k"), lit("b").alias("__src")))
    tagged
      .agg(
        hll(when(col("__src") === "a", col("__k"))).alias("est_a"),
        hll(when(col("__src") === "b", col("__k"))).alias("est_b"),
        hll(col("__k")).alias("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union"))
          .alias("est_overlap"))
  }

  private def requireIndexSchema(index: DataFrame): Unit =
    require(index.columns.sameElements(Array("fp")),
      s"index must have exactly one column 'fp', got ${index.columns.mkString(",")}")

  /** Shared head of the incremental paths: fingerprint the batch (null →
    * empty string, see [[incremental]]) and collapse within-batch
    * duplicates to the deterministic min-id survivor.
    */
  private def fingerprintAndCollapse(batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cols = batch.columns.toSeq
    batch
      .withColumn("__fp", md5(coalesce(lower(trim(col(textCol))), lit(""))))
      .groupBy(col("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).alias("__row"))
      .select(col("__fp") +: cols.map(c => col(s"__row.$c").alias(c)): _*)
  }

  /** [[incremental]] with a Bloom-filter prefilter — the scale path when the
    * history index dwarfs the nightly batch (10 B docs of history vs 100 M
    * new): most batch rows are NOVEL content, and novel rows should not pay
    * the index anti-join shuffle at all.
    *
    * One aggregate job builds a Bloom filter over the index fingerprints
    * using Spark's own runtime-filter machinery (`BloomFilterAggregate` /
    * `BloomFilterMightContain` over `xxhash64` — the codegen'd pair behind
    * AQE's injected row-level runtime filters; see Spark's
    * `InjectRuntimeFilter`). Batch rows the filter rejects are DEFINITELY
    * new and bypass the join; only the ~`fpp` false-positive tail plus the
    * genuinely-seen rows are confirmed by the exact anti-join, so the
    * shuffled side shrinks from |batch| to |seen| + fpp·|novel|. The result
    * is therefore EXACTLY [[incremental]]'s — the Bloom filter only decides
    * who pays the shuffle, never who survives.
    *
    * `expectedItems` sizes the filter (bits = -n·ln(fpp)/ln²2 ≈ 1.2 GB for
    * 10⁹ items at 1 %): a caller that tracks the index cardinality should
    * pass it; undersizing only degrades fpp (more rows confirmed by join),
    * never correctness. The serialized filter travels to executors as a
    * broadcast-sized literal — at extreme index sizes, raise `fpp` to trade
    * join traffic for filter memory.
    *
    * The batch plan is evaluated twice (definitely-new scan + maybe-seen
    * join side) — both are map-side re-reads of the collapsed batch;
    * callers holding an expensive upstream lineage should persist `batch`
    * first.
    */
  def incrementalBloom(batch: DataFrame, index: DataFrame, idCol: String,
      textCol: String = "text", expectedItems: Long = 1L << 22,
      fpp: Double = 0.01): IncrementalResult = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    requireIndexSchema(index)
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0, 1), got $expectedItems / $fpp")
    val withFp = fingerprintAndCollapse(batch, idCol, textCol)

    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate silently clamps its arguments to the runtime-
    // filter SQLConf ceilings (maxNumItems default 4M, maxNumBits default
    // 64M bits = 8 MB) — sized for AQE's injected filters, not for an
    // explicit 10⁹-item index build. Without raising them a large
    // `expectedItems` quietly degrades fpp far below the requested value
    // (correctness unaffected — the filter only routes — but the perf
    // contract breaks). Raise both for the build, restore after.
    val spark = index.sparkSession
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey  = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = spark.conf.getOption(itemsKey)
    val prevBits  = spark.conf.getOption(bitsKey)
    val serialized = try {
      spark.conf.set(itemsKey, math.max(expectedItems, 4194304L))
      spark.conf.set(bitsKey, math.max(numBits, 67108864L))
      val buildAgg = new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(col("fp"))),
        Literal(expectedItems), Literal(numBits))
      index
        .select(GraftSqlBridge.column(buildAgg.toAggregateExpression()).alias("bf"))
        .head().getAs[Array[Byte]](0)
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore(itemsKey, prevItems); restore(bitsKey, prevBits)
    }

    val accepted =
      if (serialized == null) withFp // empty index: everything is new
      else {
        val might = GraftSqlBridge.column(new BloomFilterMightContain(
          Literal(serialized, BinaryType),
          GraftSqlBridge.expression(xxhash64(col("__fp")))))
        val definitelyNew = withFp.filter(!might)
        val confirmedNew = withFp.filter(might)
          .join(index, withFp("__fp") === index("fp"), "left_anti")
        definitelyNew.unionByName(confirmedNew)
      }
    val updatedIndex = index
      .unionByName(accepted.select(col("__fp").alias("fp")))
      .distinct()
    IncrementalResult(accepted.drop("__fp"), updatedIndex)
  }

  /** SimHash near-dup clustering: 64-bit simhash per doc; docs sharing the
    * hash (Hamming 0) group directly. For Hamming ≤ k matching, block on
    * rotated prefix bands of the hash (same bucket-join shape as MinHash).
    * Returns the input with a `simhash` column.
    */
  def withSimhash(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("simhash", TextFunctions.simhash(TextFunctions.tokens(col(textCol))))

  /** n-gram Jaccard verified pairs, candidates from cheap blocking on shared
    * rare shingle hash (min shingle hash = cheapest 1-hash MinHash band).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String = "text",
      n: Int = 3, minJaccard: Double = 0.5,
      maxBucketSize: Int = defaultMaxBucketSize): DataFrame = {
    val withSh = df.select(col(idCol).alias("__id"),
      hashedShingles(col(textCol), n).alias("__sh"))
    val blocked = withSh.select(col("__id"),
      array_min(col("__sh")).alias("__minsh"))
    val candidates = cappedCandidatePairs(blocked, Seq("__minsh"), maxBucketSize)
    verifyJaccard(candidates, withSh, minJaccard)
  }

  /** Cosine verification of candidate id-pairs: re-attach vectors by id and
    * keep pairs at or above `minCosine` — shared by the hyperplane-bucket
    * and k-means-cluster near-dup paths.
    */
  private def verifyCosine(candidates: DataFrame, vecs: DataFrame,
      minCosine: Double): DataFrame =
    candidates
      .join(vecs.select(col("__id").alias("id_a"), col("__v").alias("v_a")), Seq("id_a"))
      .join(vecs.select(col("__id").alias("id_b"), col("__v").alias("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSim(col("v_a"), col("v_b")).alias("cosine"),
        col("capped"))
      .filter(col("cosine") >= minCosine)

  /** Embedding near-dup pairs: LSH-bucket on random-hyperplane sign bits,
    * verify cosine inside buckets. Deterministic planes from `seed`.
    * Returns `(id_a, id_b, cosine, capped)` with cosine ≥ `minCosine`
    * (`capped` = pair produced only by an oversized bucket's star
    * topology — see [[bucketStats]]).
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planeBits: Int = 16, minCosine: Double = 0.95,
      seed: Long = 42L, maxBucketSize: Int = defaultMaxBucketSize): DataFrame = {
    val vecs = df.select(col(idCol).alias("__id"), col(vecCol).alias("__v"))
    val bucketed = vecs.select(col("__id"),
      Similarity.hyperplaneBucket(col("__v"), dim, planeBits, seed).alias("__bucket"))
    val candidates = cappedCandidatePairs(bucketed, Seq("__bucket"), maxBucketSize)
    verifyCosine(candidates, vecs, minCosine)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication", 2023):
    * cluster the embedding space with a k-means coarse quantizer, then
    * compare cosines ONLY within each cluster — the candidate scope that
    * makes semantic dedup tractable at corpus scale. Identical construction
    * discipline as the other near-dup paths: cluster assignment is a narrow
    * codegen map (centroids broadcast as a reference object), candidates
    * come from the hot-bucket-capped equi-self-join on the cell id, and
    * exact cosine verifies inside cells. Pass prebuilt `centroids` (from
    * [[Similarity.trainIvfCentroids]]) to skip the training sample scan.
    * Returns `(id_a, id_b, cosine, capped)` with cosine ≥ `minCosine`.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numClusters: Int = 256, minCosine: Double = 0.95,
      seed: Long = 42L, maxBucketSize: Int = defaultMaxBucketSize,
      centroids: Option[Array[Float]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      Similarity.trainIvfCentroids(df, vecCol, dim, numClusters, seed))
    val vecs = df.select(col(idCol).alias("__id"), col(vecCol).alias("__v"))
    val clustered = vecs.select(col("__id"),
      element_at(VectorFunctions.nearestCells(col("__v"), cents, dim, 1), 1)
        .alias("__cell"))
    val candidates = cappedCandidatePairs(clustered, Seq("__cell"), maxBucketSize)
    verifyCosine(candidates, vecs, minCosine)
  }
}
