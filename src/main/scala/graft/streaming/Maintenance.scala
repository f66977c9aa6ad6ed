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
}
