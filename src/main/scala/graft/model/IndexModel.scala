package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The metadata-index data model.
  *
  * Mirrors the reference's index document (its struct at
  * /root/reference/persistor/internal/common/metadata.go:20-58 and the
  * formatter at persistor/internal/indexer/formatter.go:27-70):
  * broker_id, broker_msg_id, unique_id = broker_id+"_"+msg_id,
  * business_source_key/business_object_key extracted from attributes,
  * index_source_key = bsk+"_"+bok, ordering_key, additional_metadata map,
  * location{key,position}, publish/ingestion timestamps, confirmation_flag.
  *
  * At rest this is a columnar (parquet) table instead of MongoDB; all the
  * reference's Mongo `Find` shapes become Catalyst filters with predicate
  * pushdown + column pruning into the scan (SURVEY §4).
  *
  * Scale note: `additional_metadata` stays an open MapType for fidelity, but
  * the hot key is ALSO materialized as a plain string column (`meta_k`) —
  * map lookups can't be pushed to parquet, materialized columns can
  * (SURVEY §7.4 item 6).
  */
object IndexModel {

  /** All queryable attributes — the reference's filter whitelist
    * (indexer-api/lib/util.go:122-144). `additional_metadata.*` prefix
    * lookups are allowed on top of these.
    */
  val QueryableAttributes: Set[String] = Set(
    "broker_id", "broker_msg_id", "business_source_key", "business_object_key",
    "unique_id", "index_source_key", "ordering_key", "location_key",
    "location_position", "publish_time", "ingestion_time",
    "indexer_ingestion_time", "confirmation_flag", "additional_metadata",
    // engine extension: the hot metadata key materialized as a plain column
    // so its predicates push down to parquet (SURVEY §7.4 item 6)
    "meta_k")

  /** The three timestamp attributes whose string filter values get coerced
    * (indexer-api/lib/util.go:222-285).
    */
  val TimestampAttributes: Set[String] =
    Set("publish_time", "ingestion_time", "indexer_ingestion_time")

  /** Canonical column order of the index table. */
  val Columns: Seq[String] = Seq(
    "broker_id", "broker_msg_id", "unique_id",
    "business_source_key", "business_object_key", "index_source_key",
    "ordering_key", "meta_k", "additional_metadata",
    "location_key", "location_position",
    "publish_time", "ingestion_time", "confirmation_flag")

  /** Metadata map keys ALSO materialized as plain columns — query filters
    * on `additional_metadata.<key>` are rewritten to the column so the
    * predicate pushes down to parquet (a map probe never does).
    */
  val MaterializedMetaKeys: Map[String, String] = Map("k" -> "meta_k")

  /** Number of messages per stored blob in the synthetic derivation —
    * stands in for the reference's mini-batch (BatchSize default 5000,
    * persistor/config/persistor.toml:80), sized down to the testdata.
    */
  val BlobSize = 100

  /** Derive a deterministic index table from the `events` testdata table,
    * playing the role of the indexer's output after a persist run: each
    * event is a message; blocks of [[BlobSize]] events form one blob;
    * `location_position` is the 1-based position inside its blob exactly
    * like the reference assigns it at publish time
    * (persistor/internal/sender/sender.go:186-192).
    *
    * Every derivation rule is reproducible in ANSI SQL so the DuckDB oracle
    * can build the identical table (see SparkEntry.IndexCte).
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val blobNo = expr(s"event_id DIV $BlobSize")
    val bsk = when(col("user_id") % 5 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("bsk"), (col("user_id") % 5).cast("string")))
    val bok = concat(lit("bok"), (col("event_id") % 10).cast("string"))
    val posWindow = Window.partitionBy(col("blob_no")).orderBy(col("event_id"))

    events
      .withColumn("blob_no", blobNo)
      .withColumn("broker_id", concat(lit("t-"), col("event_type")))
      .withColumn("broker_msg_id", col("event_id").cast("string"))
      .withColumn("unique_id", concat(col("broker_id"), lit("_"), col("broker_msg_id")))
      .withColumn("business_source_key", bsk)
      .withColumn("business_object_key", bok)
      .withColumn("index_source_key",
        when(bsk.isNull, lit(null).cast("string"))
          .otherwise(concat(bsk, lit("_"), bok)))
      .withColumn("ordering_key",
        when(col("user_id") % 3 === 0, lit(""))
          .otherwise(concat(lit("u"), col("user_id").cast("string"))))
      .withColumn("meta_k", get_json_object(col("props"), "$.k"))
      .withColumn("additional_metadata", map(lit("k"), col("meta_k")))
      .withColumn("location_key",
        concat(lit("gs://graft/events/blob-"), col("blob_no").cast("string")))
      .withColumn("location_position", row_number().over(posWindow).cast("long"))
      .withColumn("publish_time", col("ts"))
      .withColumn("ingestion_time", col("ts") + expr("INTERVAL 1 SECOND"))
      .withColumn("confirmation_flag", lit(false))
      .select(Columns.map(col): _*)
  }

  /** Same projection minus the MapType column — parquet-dump-friendly for
    * the oracle gate (map columns don't survive a pandas value compare).
    */
  def fromEventsFlat(events: DataFrame): DataFrame =
    fromEvents(events).drop("additional_metadata")

  /** The stored-record view of the same events: what reading the persisted
    * blobs back yields — (location, 1-based position, payload), the replay
    * pipeline's left side for the positional join (SURVEY §2.4 J2). The
    * position is a stored column, never file order (SURVEY §7.4 item 2).
    */
  def recordsFromEvents(events: DataFrame): DataFrame = {
    val posWindow = Window.partitionBy(col("blob_no")).orderBy(col("event_id"))
    events
      .withColumn("blob_no", expr(s"event_id DIV $BlobSize"))
      .withColumn("location_key",
        concat(lit("gs://graft/events/blob-"), col("blob_no").cast("string")))
      .withColumn("location_position", row_number().over(posWindow).cast("long"))
      .select(col("location_key"), col("location_position"),
        col("props").as("payload"))
  }
}
