package graft.store

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.model.IndexModel

/** The metadata index as a materialized columnar STORE, not a per-query
  * derivation.
  *
  * The reference keeps its index in MongoDB (indexer-api/lib/repo/mongo.go)
  * — a persistent store the query surface scans. Round 1 re-derived the
  * index from `events.parquet` on every query (a window shuffle +
  * `get_json_object` per row per query); this materializes it once to
  * parquet and serves every S7-S10/A1-A3 query from the scan, so predicate
  * pushdown and column pruning actually hit a file source.
  *
  * Layout choices, sized for 100 TB:
  *   - `partitionBy(broker_id)`: every reference query filters on
  *     broker_id (interval scans require it) — directory-level pruning.
  *     At real scale a `pub_date` partition column would be added under it.
  *   - `sortWithinPartitions(publish_time, unique_id)`: parquet row-group
  *     min/max stats then prune time intervals and id point lookups inside
  *     each partition.
  *   - the hot metadata key is materialized as the plain `meta_k` column
  *     (map probes can never push down; column probes do).
  *
  * Freshness: the derivation is rewritten once per JVM per source dir
  * (tracked in [[written]]) — driver runs (Verify/Bench) are fresh JVMs, so
  * a stale materialization can never leak across code changes; within a
  * run the write happens exactly once.
  */
object IndexStore {

  private val written = new ConcurrentHashMap[String, String]()

  def workRoot: String =
    sys.env.getOrElse("GRAFT_WORK_DIR", s"${sys.props("user.dir")}/target/graft-work")

  private def indexPath(sfDir: String): String =
    s"$workRoot/index-${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** The materialized index table for a testdata dir: written on first use
    * in this JVM, then served from the parquet scan.
    */
  def materialized(spark: SparkSession, sfDir: String): DataFrame = {
    val path = written.computeIfAbsent(sfDir, { dir =>
      val p = indexPath(dir)
      IndexModel
        .fromEvents(Tables(spark, dir).events)
        .repartition(col("broker_id"))
        .sortWithinPartitions(col("publish_time"), col("unique_id"))
        .write
        .mode("overwrite")
        .partitionBy("broker_id")
        .parquet(p)
      p
    })
    // partition column comes back at the end of the schema; restore the
    // canonical column order so downstream projections are stable
    spark.read.parquet(path).select(IndexModel.Columns.map(col): _*)
  }
}
