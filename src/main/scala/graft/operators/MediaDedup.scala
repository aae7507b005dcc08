package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental perceptual dedup — d09's signature-store loop at the
  * media layer, so a production media pipeline pays per BATCH, never
  * per corpus: the 64-bit fingerprints (image dHash m08, audio
  * Haitsma–Kalker m10, video frame hashes) live in a bucketed store
  * and each new batch classifies against it with zero store-side
  * exchange, appends its uniques, and rides the shared tombstone +
  * compaction machinery ([[Dedup]]'s).
  *
  * Store layout for `name`:
  *   - `${name}_fpblocks` (skey, doc_id, hash_hi, hash_lo) BUCKETED
  *     BY skey = xxhash64(j, bk) over [[Multimodal.hammingBlockKeys]]
  *     — the probe join target. Carrying the full hash in the block
  *     row makes the candidate join and the exact-hamming verify ONE
  *     hop (no second join back to a hash table). xxhash64 collisions
  *     can only ADD candidates (equal (j, bk) always collide), and
  *     the exact bit_count verify removes them — d02's skey argument.
  *   - `${name}_fps` (doc_id, hash_hi, hash_lo) bucketed by doc_id —
  *     the append-side dedup frame (anti-join target for crash
  *     replays) and the media_type-free canonical hash table.
  *   - `${name}_tombstones` — [[Dedup]]'s suppression list, shared
  *     verbatim (retire via [[deleteFromFingerprintStore]]).
  *   - `${name}_fpdial` — one row recording the blocking scheme. The
  *     scheme is FIXED per store (StoreFold's dial discipline): a
  *     store blocked with 2-of-8 chunk-pair keys probed with 3-chunk
  *     keys (or vice versa) would silently lose candidates, so
  *     ingest/append fail fast on a scheme mismatch.
  */
object MediaDedup {

  /** Blocking scheme id for a threshold — must agree between store
    * build and every later probe (see [[Multimodal.hammingBlockKeys]]
    * for the two schemes' completeness arithmetic). */
  private[operators] def schemeOf(maxHamming: Int): String = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"chunk-pair blocking is complete only for maxHamming <= 6, got $maxHamming")
    if (maxHamming <= 2) "chunks21" else "pairs16"
  }

  private def blocksOf(fps: DataFrame, maxHamming: Int): DataFrame =
    Multimodal.hammingBlockKeys(
        fps.select(col("doc_id"), col("hash_hi"), col("hash_lo")), maxHamming)
      .select(xxhash64(col("j"), col("bk")).as("skey"),
        col("doc_id"), col("hash_hi"), col("hash_lo"))

  /** Build (or rebuild) the fingerprint store from a full corpus of
    * (doc_id, hash_hi, hash_lo). A rebuild is a new store GENERATION:
    * tombstones reset with it (writeSignatureStore's contract). */
  def writeFingerprintStore(spark: SparkSession, name: String,
      fps: DataFrame, maxHamming: Int, buckets: Int = 8): Unit = {
    graft.sources.Sinks.writeBucketed(
      blocksOf(fps, maxHamming), s"${name}_fpblocks", buckets, "skey")
    graft.sources.Sinks.writeBucketed(
      fps.select(col("doc_id"), col("hash_hi"), col("hash_lo")),
      s"${name}_fps", buckets, "doc_id")
    graft.sources.Sinks.clearOrphanLocation(spark, s"${name}_fpdial")
    import spark.implicits._
    Seq((schemeOf(maxHamming), maxHamming)).toDF("scheme", "max_hamming")
      .coalesce(1).write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_fpdial")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_tombstones")
  }

  /** Fail-fast scheme check — the store's blocking layout is fixed at
    * build time; probing with the other scheme's keys would silently
    * lose candidates (recall, not just cost). */
  private def requireScheme(spark: SparkSession, name: String,
      maxHamming: Int): Unit = {
    val dial = spark.table(s"${name}_fpdial").collect()
    require(dial.length == 1, s"${name}_fpdial is not a one-row dial table")
    val stored = dial(0).getAs[String]("scheme")
    val want = schemeOf(maxHamming)
    require(stored == want,
      s"$name: blocking scheme changed against an existing store — " +
        s"built as '$stored', this probe's maxHamming=$maxHamming needs " +
        s"'$want'; keys would not collide and candidates would be " +
        "silently lost. Rebuild the store or match the threshold tier.")
  }

  /** Candidate (batch_id, corpus_id, hamming) pairs of a batch
    * against the store — one equi join on the bucketed skey (zero
    * store-side exchange; only the batch shuffles), exact-hamming
    * verified in the same hop. Excludes corpus_id == batch_id so a
    * crash-replayed batch whose append already landed cannot match
    * ITSELF (d09's idempotence discipline). */
  def fingerprintPairsAgainstStore(spark: SparkSession, name: String,
      batch: DataFrame, maxHamming: Int): DataFrame = {
    requireScheme(spark, name, maxHamming)
    val bk = Multimodal.hammingBlockKeys(
        batch.select(col("doc_id"), col("hash_hi"), col("hash_lo")), maxHamming)
      .select(xxhash64(col("j"), col("bk")).as("skey"),
        col("doc_id").as("batch_id"),
        col("hash_hi").as("bh"), col("hash_lo").as("bl"))
    val cb = Dedup.dropTombstoned(spark, name,
        spark.table(s"${name}_fpblocks"), "doc_id")
      .select(col("skey"), col("doc_id").as("corpus_id"),
        col("hash_hi").as("ch"), col("hash_lo").as("cl"))
    bk.join(cb, "skey")
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        expr("bit_count(bh ^ ch) + bit_count(bl ^ cl)").cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** One production media-ingest step: classify `batch` (doc_id,
    * hash_hi, hash_lo) against the store — `near` with the smallest
    * matching corpus id within `maxHamming`, else `unique` — append
    * the unique docs' fingerprints so the next batch dedups against
    * them, and return the classification. Append-side dedup +
    * tombstone suppression make a crash-replayed batch idempotent
    * ([[Dedup.ingestBatch]]'s contract, including the immutable
    * doc_id requirement). */
  def ingestFingerprintBatch(spark: SparkSession, name: String,
      batch: DataFrame, maxHamming: Int): DataFrame = {
    val matches = fingerprintPairsAgainstStore(spark, name, batch, maxHamming)
      .groupBy(col("batch_id")).agg(min(col("corpus_id")).as("match_id"))
    val classified = batch.select(col("doc_id"))
      .join(matches, col("doc_id") === col("batch_id"), "left")
      .select(col("doc_id"),
        when(col("match_id").isNotNull, "near").otherwise("unique").as("status"),
        coalesce(col("match_id"), lit(-1L)).as("match_id"))
      .localCheckpoint(true)
    val uniques = batch.join(
      classified.filter(col("status") === "unique").select("doc_id"), "doc_id")
    val fresh = Dedup.dropTombstoned(spark, name, uniques.join(
      spark.table(s"${name}_fps").select("doc_id"), Seq("doc_id"), "left_anti"),
      "doc_id")
    appendToFingerprintStore(spark, name, fresh)
    classified
  }

  /** Append a batch's fingerprints to an existing store (no rebuild;
    * one more file per bucket per append — compact on cadence). The
    * scheme comes from the store's own dial, so appended rows block
    * exactly like the originals. */
  def appendToFingerprintStore(spark: SparkSession, name: String,
      batch: DataFrame): Unit = {
    val maxHamming =
      spark.table(s"${name}_fpdial").collect()(0).getAs[Int]("max_hamming")
    val buckets = {
      val rows = spark.sql(s"DESCRIBE TABLE EXTENDED ${name}_fpblocks").collect()
      rows.find(_.getString(0) == "Num Buckets").map(_.getString(1).trim.toInt)
        .getOrElse(sys.error(s"${name}_fpblocks is not a bucketed store"))
    }
    blocksOf(batch, maxHamming).write.mode(SaveMode.Append)
      .bucketBy(buckets, "skey").sortBy("skey")
      .format("parquet").saveAsTable(s"${name}_fpblocks")
    batch.select(col("doc_id"), col("hash_hi"), col("hash_lo"))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${name}_fps")
  }

  /** Initialize the cluster-label store for a fingerprint corpus —
    * [[Dedup.writeLabelStore]]'s shape with the hamming join as the
    * pair source: one connected-components run over the corpus' own
    * near-dup pairs (the LAST full run ever needed), singletons
    * labeled by their own id, empty remap. Pair with
    * [[writeFingerprintStore]] on the same corpus; read current
    * assignments via [[Dedup.clusterLabels]] (the tables are the
    * same layout, so the label machinery is shared verbatim). */
  def writeFingerprintLabelStore(spark: SparkSession, name: String,
      fps: DataFrame, maxHamming: Int, buckets: Int = 8): Unit = {
    val cc = Dedup.connectedComponents(
      Multimodal.hammingPairs(
        fps.select(col("doc_id"), col("hash_hi"), col("hash_lo")), maxHamming)
        .select(col("id_a"), col("id_b")))
    val labels = fps.select(col("doc_id"))
      .join(cc, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("lab"), col("doc_id")).as("root"))
    graft.sources.Sinks.writeBucketed(labels, s"${name}_labels", buckets, "doc_id")
    graft.sources.Sinks.clearOrphanLocation(spark, s"${name}_remap")
    Dedup.emptyRemap(spark).write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_remap")
  }

  /** [[ingestFingerprintBatch]] + incremental cluster-label
    * maintenance — [[Dedup.ingestBatchLabeled]]'s attach/merge/remap
    * machinery ([[Dedup.labeledIngest]]) with the fingerprint store's
    * pair source and unique-append: each near-dup attaches to the
    * smallest matched cluster root, bridged clusters merge by remap
    * rows only, and the returned rows carry the doc's CURRENT
    * cluster_id. Cost ∝ batch; replay-idempotent for the same
    * reasons. */
  def ingestFingerprintBatchLabeled(spark: SparkSession, name: String,
      batch: DataFrame, maxHamming: Int): DataFrame =
    Dedup.labeledIngest(spark, name, batch,
      fingerprintPairsAgainstStore(spark, name, batch, maxHamming),
      uniques => appendToFingerprintStore(spark, name,
        Dedup.dropTombstoned(spark, name,
          uniques.join(spark.table(s"${name}_fps").select("doc_id"),
            Seq("doc_id"), "left_anti"), "doc_id")))

  /** Retire fingerprints (takedown / TTL): [[Dedup]]'s lazy tombstone
    * machinery verbatim — reads anti-join, compaction reclaims. */
  def deleteFromFingerprintStore(spark: SparkSession, name: String,
      ids: DataFrame): Unit =
    Dedup.deleteFromSignatureStore(spark, name, ids)

  /** Bucketed in-place rewrite of both store tables (one sorted file
    * per bucket restored, tombstoned rows dropped physically) —
    * [[Dedup.compactStoreTable]]'s swap, fingerprint tables. */
  def compactFingerprintStore(spark: SparkSession, name: String): Unit =
    Seq(s"${name}_fpblocks" -> "skey", s"${name}_fps" -> "doc_id")
      .foreach { case (t, k) => Dedup.compactStoreTable(spark, name, t, k) }

  /** Threshold-triggered compaction — [[Dedup.maybeCompactSignatureStore]]'s
    * cadence invariant on the fingerprint tables. */
  def maybeCompactFingerprintStore(spark: SparkSession, name: String,
      maxFilesPerBucket: Int): Boolean = {
    require(maxFilesPerBucket >= 1,
      s"need maxFilesPerBucket >= 1, got $maxFilesPerBucket")
    val buckets = {
      val rows = spark.sql(s"DESCRIBE TABLE EXTENDED ${name}_fpblocks").collect()
      rows.find(_.getString(0) == "Num Buckets").map(_.getString(1).trim.toInt)
        .getOrElse(sys.error(s"${name}_fpblocks is not a bucketed store"))
    }
    val worst = Seq(s"${name}_fpblocks", s"${name}_fps")
      .map(t => Dedup.tableFileCount(spark, t)).max
    if (worst > buckets.toLong * maxFilesPerBucket) {
      compactFingerprintStore(spark, name); true
    } else false
  }
}
