package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Store maintenance. A micro-batched sink accretes one small file set
  * per trigger (the index store gains a `batch_id=<n>` slice every batch)
  * — at streaming rates that is thousands of KB-sized parquet files per
  * day, and scan cost becomes file-listing-bound long before it is
  * IO-bound. Compaction rewrites a partitioned store into few
  * size-targeted files per partition; the reference's analog concern is
  * blob granularity via `BatchSize` (BASELINE.md §A) — it sizes ingest
  * batches up-front, while a micro-batch sink must consolidate after the
  * fact.
  */
object Maintenance {

  /** Drift-triggered IVF index maintenance — the one policy operator for
    * the loop a crawl deployment otherwise composes by hand: read the
    * CURRENT catalog version's accumulated
    * [[graft.operators.Similarity.cellStats]] state, and when any
    * cell's population crosses `maxCellSize` (the
    * [[graft.operators.Similarity.cellLoad]] `over_valve` signal — the
    * same threshold past which within-cell serves start 2-D block
    * splitting, i.e. the quantizer no longer fits the corpus):
    *
    *   1. [[graft.operators.Similarity.retrainIvfStore]] to a fresh
    *      version directory
    *      ([[graft.store.StoreCatalog.nextVersionDir]]),
    *   2. [[graft.store.StoreCatalog.publish]] — the atomic pointer
    *      flip; serves stay bit-exact across it because the old version
    *      remains fully serveable until the rename lands and the new
    *      one loads through the stamped loaders,
    *   3. [[graft.store.StoreCatalog.gcSuperseded]] under `graceMs`.
    *
    * Returns Some(refreshed centroids → new version dir) when a swap
    * happened, None when the store is healthy (no writes at all — the
    * check is one aggregation over the metadata-sized stats table).
    * Idempotent at the policy level: a freshly retrained quantizer that
    * STILL has an over-valve cell (possible — retraining moves
    * centroids but cannot split them) retrains again on the next tick;
    * schedule the policy, don't loop it.
    */
  def maintainIvfStore(
      spark: SparkSession,
      catalogRoot: String,
      name: String,
      versionsRoot: String,
      maxCellSize: Int,
      graceMs: Long = 3600000L): Option[(Array[Array[Double]], String)] = {
    import graft.operators.Similarity
    import graft.store.StoreCatalog
    val current = StoreCatalog.resolve(spark, catalogRoot, name)
    val drifted = !Similarity.cellLoad(
        Similarity.loadCellStats(spark, current), maxCellSize)
      .filter(col("over_valve")).isEmpty
    if (!drifted) None
    else {
      val next = StoreCatalog.nextVersionDir(spark, versionsRoot)
      val cents = Similarity.retrainIvfStore(spark, current, next)
      StoreCatalog.publish(spark, catalogRoot, name, next)
      StoreCatalog.gcSuperseded(spark, catalogRoot, name, versionsRoot, graceMs)
      Some((cents, next))
    }
  }

  /** Rewrite the parquet store at `inPath` to `outPath` with at most
    * `targetRows` rows per file inside each `partitionCols` directory:
    * one shuffle onto the partition keys (plus a salt when
    * `tasksPerPartition` > 1 — the knob for hot partitions), rows sorted
    * by `orderCol` within each task for row-group pruning on read-back,
    * and the writer's `maxRecordsPerFile` cutting files at the target.
    * Content-preserving (same rows, re-laid-out); `dropCols` removes
    * columns that only encoded micro-batch bookkeeping (e.g. `batch_id`)
    * — the compacted snapshot is an archive, idempotent-reprocessing
    * bookkeeping belongs to the live zone.
    *
    * With `tasksPerPartition` = 1 each partition is one task writing
    * ⌈n/targetRows⌉ files in full `orderCol` order; salted parallelism
    * trades global order (per-file order remains, so min/max row-group
    * stats still prune) for cluster-wide write bandwidth.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partitionCols: Seq[String],
      orderCol: String,
      targetRows: Long,
      tasksPerPartition: Int = 1,
      dropCols: Seq[String] = Nil): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column")
    require(targetRows > 0 && tasksPerPartition > 0, "positive targets required")
    val df = spark.read.parquet(inPath).drop(dropCols: _*)
    val shuffleKeys =
      if (tasksPerPartition == 1) partitionCols.map(col)
      else partitionCols.map(col) :+
        pmod(xxhash64(col(orderCol)), lit(tasksPerPartition))
    df
      .repartition(shuffleKeys: _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .partitionBy(partitionCols: _*)
      .parquet(outPath)
  }

  /** Write a frame as a BUCKETED table: rows hash-partitioned into
    * `numBuckets` files by `bucketCols` at write time, with the layout
    * recorded in the catalog. Two tables bucketed the same way equi-join
    * on the bucket columns with NO exchange on either side — the shuffle
    * is paid once at write time and amortized over every subsequent join,
    * the standard layout for a store that is repeatedly point/semi-joined
    * on its key (e.g. the index joined to replay manifests). Sorted within
    * buckets so merge joins need no sort either.
    */
  def writeBucketed(
      df: org.apache.spark.sql.DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty && numBuckets > 0, "bucket spec required")
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Retention / data-subject deletion with a tombstone audit — the
    * GDPR-shaped maintenance pass a stored corpus needs: rows matching
    * `pred` are REMOVED (survivors returned for rewrite), and the audit
    * table proves WHAT was removed without retaining the payload — per
    * `groupCols` group: `n_deleted`, `n_kept`, and `del_fp_sum`, the
    * order-independent Σ (h60(key) mod 1000003) over the deleted keys
    * (the [[graft.operators.Layout.shardManifest]] fingerprint: residues
    * are < 2^20 so the sum stays exact in int64 at any corpus size; an
    * auditor holding the deletion request's key list re-derives the sum
    * and matches it — proof of erasure, no payload kept).
    *
    * A NULL predicate value KEEPS the row: deletion must affirmatively
    * match (the conservative rule for three-valued predicates — a
    * malformed retention clause must not silently erase).
    *
    * Scale shape: one filtered scan for survivors, one keyed aggregation
    * for the audit — both partial-aggregated; no shuffle on the survivor
    * path, so the rewrite parallelizes like any store write.
    */
  def deleteWhere(
      df: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column,
      groupCols: Seq[String],
      key: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(groupCols.nonEmpty, "at least one audit group column")
    val hit = coalesce(pred, lit(false))
    val survivors = df.filter(!hit)
    val audit = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(hit, lit(1L)).otherwise(lit(0L))).as("n_deleted"),
        sum(when(hit, lit(0L)).otherwise(lit(1L))).as("n_kept"),
        coalesce(
          sum(when(hit,
            pmod(graft.functions.TextFunctions.h60(key.cast("string")),
              lit(1000003L)))),
          lit(0L)).as("del_fp_sum"))
    (survivors, audit)
  }

  /** CDC-style latest-per-key snapshot of an append-only store: keep the
    * row with the greatest `versionCols` value per `keyCols` group
    * (`versionCols` must totally order rows within a key — add a unique
    * tiebreaker like the record id).
    *
    * Implemented as ONE aggregation of `max(struct(version…, rest…))` —
    * struct comparison is lexicographic, so the version columns lead —
    * which gets a map-side partial max: only one candidate row per key
    * per input partition reaches the shuffle. The textbook
    * `row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1`
    * shuffles EVERY row to sort whole groups; at 100 TB of updates to a
    * bounded key space that is the difference between shuffling the
    * corpus and shuffling ~|keys|·|partitions| rows.
    */
  def latestSnapshot(
      df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty, "keys and versions required")
    val rest = df.columns.toSeq
      .filterNot(c => keyCols.contains(c) || versionCols.contains(c))
    val ordered = versionCols ++ rest
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_latest"))
      .select(keyCols.map(col) ++ ordered.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Corpus snapshot diff — the release-engineering readout between two
    * corpus versions: per `group` (source/domain/shard), how many keyed
    * rows were ADDED (key only in `b`), REMOVED (key only in `a`),
    * CHANGED (key in both, content fingerprint differs), and UNCHANGED.
    * This is what a dataset release publishes next to its
    * [[graft.operators.Layout.shardManifest]]: a consumer diffing v1→v2
    * knows whether re-training is warranted and which sources moved —
    * without scanning either corpus again.
    *
    * One md5 projection per side and ONE full-outer equi-join on the key
    * — both corpora stream through once; the output is |groups| rows.
    * The group of an added row comes from `b`, of a removed row from `a`
    * (a changed row reports under its NEW group — re-homed rows count as
    * changed in the destination, the convention a per-source card wants).
    */
  def corpusDiff(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      keyCol: String,
      contentCol: String,
      groupCol: String): org.apache.spark.sql.DataFrame = {
    def prep(df: org.apache.spark.sql.DataFrame, side: String) = df
      .select(col(keyCol).as("k"),
        md5(col(contentCol).cast("string")).as(s"fp_$side"),
        col(groupCol).as(s"g_$side"))
    prep(a, "a").join(prep(b, "b"), Seq("k"), "full_outer")
      .select(coalesce(col("g_b"), col("g_a")).as("g"),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("g"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
