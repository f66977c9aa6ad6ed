package graft.store

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.IndexModel
import graft.streaming.PersistPipeline

/** The metadata index as a materialized columnar STORE, not a per-query
  * derivation.
  *
  * The reference keeps its index in MongoDB (indexer-api/lib/repo/mongo.go)
  * — a persistent store the query surface scans. Here the store is the
  * output of the REAL persist pipeline ([[PersistPipeline]]): events →
  * Avro records + indexer topic → strict decode/validate → partitioned
  * parquet index. Every S7-S10/A1-A3 query is served from that scan, so
  * predicate pushdown and column pruning actually hit a file source.
  *
  * Layout, sized for 100 TB:
  *   - `partitionBy(broker_id)`: every reference query filters on
  *     broker_id (interval scans require it) — directory-level pruning.
  *     At real scale a `pub_date` partition column would be added under it.
  *   - `sortWithinPartitions(publish_time, unique_id)`: parquet row-group
  *     min/max stats then prune time intervals and id point lookups inside
  *     each partition.
  *   - the hot metadata key is materialized as the plain `meta_k` column
  *     (map probes can never push down; column probes do).
  */
object IndexStore {

  /** The materialized index table for a testdata dir: built by the persist
    * pipeline on first use in this JVM, then served from the parquet scan.
    */
  def materialized(spark: SparkSession, sfDir: String): DataFrame = {
    val workDir = PersistPipeline.ensureRun(spark, sfDir)
    // batch_id/broker_id come back as trailing partition columns; restore
    // the canonical column order so downstream projections are stable
    spark.read.parquet(s"$workDir/index").select(IndexModel.Columns.map(col): _*)
  }
}
