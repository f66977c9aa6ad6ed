package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.model.IndexModel
import graft.operators.Persist

/** The streaming persist pipeline — the Spark-native equivalent of the
  * reference's Persistor Core + Indexer programs (SURVEY §3.1/§3.2):
  *
  *   source → envelope → blob/location assignment (T1) →
  *     Avro OCF records write (K1/D1) →
  *     indexer-topic JSON publish (K4/D3)
  *   indexer topic → strict JSON decode (D4) → validation (T7) →
  *     timestamp formatting (T8) → index store append | dead-letter (K5/W3)
  *
  * The broker hops become durable file "topics" under a work dir (no Kafka
  * connector ships in this environment); every stage reads what the
  * previous stage actually WROTE — records are genuinely round-tripped
  * through Avro OCF and index docs through JSON, exactly like the
  * reference's GCS blobs + indexer topic
  * (persistor/internal/persistor/persistor.go:96-205).
  *
  * Ack semantics (SURVEY §7.4 item 1): the reference acks per message
  * after blob+index success (persistor.go:147-165). Spark's unit of retry
  * is the micro-batch, so equivalence is idempotence: every write lands
  * under a `batch_id=<id>` partition with dynamic partition overwrite — a
  * reprocessed batch replaces exactly its own output (W2: at-least-once
  * delivery, exactly-once effect). The streaming entry point wraps the
  * same batch function in checkpointed `foreachBatch` (W1).
  */
object PersistPipeline {

  /** spark-avro ships inside spark-sql here but is not service-registered,
    * so the datasource must be addressed by class name.
    */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  /** The reference's Avro record schema, verbatim semantics:
    * record persistorrecord {ID: string, Data: bytes, Metadata: map<string>}
    * (persistor/internal/common/write_to_avro.go:34-43).
    */
  val PersistorRecordAvroSchema: String =
    """{"type":"record","name":"persistorrecord","fields":[
      |{"name":"id","type":"string"},
      |{"name":"data","type":"bytes"},
      |{"name":"metadata","type":{"type":"map","values":"string"}}]}"""
      .stripMargin.replaceAll("\n", "")

  /** Timestamp wire format at the JSON boundary — micros precision, the
    * engine's analog of the reference's string layout
    * (persistor/internal/sender/sender.go:32-34).
    */
  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Index-doc JSON fields required by the indexer's validator
    * (persistor/internal/common/metadata.go:21-40: broker_id, unique_id,
    * location and timestamps carry `required` tags; business keys do not).
    */
  val RequiredKeys: Seq[String] = Seq(
    "broker_id", "broker_msg_id", "unique_id", "location_key",
    "location_position", "publish_time", "ingestion_time")

  /** Every key a well-formed index doc may carry — the strict-decode
    * whitelist (DisallowUnknownFields,
    * persistor/internal/indexer/transform.go:57-58).
    */
  val KnownKeys: Seq[String] = RequiredKeys ++ Seq(
    "business_source_key", "business_object_key", "index_source_key",
    "ordering_key", "additional_metadata")

  /** Wire schema of an index doc at the JSON boundary: everything stringly
    * typed except the open metadata map — timestamps parse in [[formatIndex]]
    * (T8), position converts atoi+1 (sender.go:186-192).
    */
  val IndexDocWireSchema: StructType = {
    val base = new StructType()
    Seq("broker_id", "broker_msg_id", "unique_id", "business_source_key",
      "business_object_key", "index_source_key", "ordering_key",
      "location_key", "location_position", "publish_time", "ingestion_time")
      .foldLeft(base)((s, f) => s.add(f, StringType))
      .add("additional_metadata",
        org.apache.spark.sql.types.MapType(StringType, StringType))
  }

  // ------------------------------------------------------------ persist side

  /** The in-flight message envelope + blob/location assignment, derived
    * deterministically from the events table (the bounded stand-in for a
    * broker subscription). Columns:
    * id, ordering_key, data (payload bytes), attributes, broker_id,
    * publish_time, ingestion_time, location_key, location_position
    * (1-based within its blob), blob_no.
    */
  def messagesFromEvents(events: DataFrame): DataFrame = {
    val blobNo = expr(s"event_id DIV ${IndexModel.BlobSize}")
    val bsk = when(col("user_id") % 5 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("bsk"), (col("user_id") % 5).cast("string")))
    val posWindow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blob_no")).orderBy(col("event_id"))
    events
      .withColumn("blob_no", blobNo)
      .withColumn("id", col("event_id").cast("string"))
      .withColumn("broker_id", concat(lit("t-"), col("event_type")))
      .withColumn("ordering_key",
        when(col("user_id") % 3 === 0, lit(""))
          .otherwise(concat(lit("u"), col("user_id").cast("string"))))
      .withColumn("data", col("props").cast("binary"))
      .withColumn("attributes",
        map_filter(
          map(
            lit("k"), get_json_object(col("props"), "$.k"),
            lit("business_source_key"), bsk,
            lit("business_object_key"),
            concat(lit("bok"), (col("event_id") % 10).cast("string"))),
          (_, v) => v.isNotNull))
      .withColumn("publish_time", col("ts"))
      .withColumn("ingestion_time", col("ts") + expr("INTERVAL 1 SECOND"))
      .withColumn("location_key",
        concat(lit("gs://graft/events/blob-"), col("blob_no").cast("string")))
      .withColumn("location_position", row_number().over(posWindow).cast("long"))
      .select("id", "ordering_key", "data", "attributes", "broker_id",
        "publish_time", "ingestion_time", "location_key", "location_position",
        "blob_no")
  }

  /** T4 `SetMetadata` (sender.go:121-133): the record metadata map =
    * user attributes ∪ {location_key, location_position (0-based string),
    * broker_id, ordering_key if nonempty}.
    */
  def recordMetadata: Column =
    map_filter(
      map_concat(
        col("attributes"),
        map(
          lit("location_key"), col("location_key"),
          lit("location_position"), (col("location_position") - 1).cast("string"),
          lit("broker_id"), col("broker_id"),
          lit("ordering_key"),
          when(col("ordering_key") === "", lit(null).cast("string"))
            .otherwise(col("ordering_key")))),
      (_, v) => v.isNotNull)

  /** T5 `ParseMessage` (sender.go:136-201) as one projection: the index
    * doc in wire form (strings + nested metadata map), serialized to JSON
    * by [[indexerPayload]] (D3).
    */
  def indexDoc: Column = {
    val bsk = element_at(col("attributes"), "business_source_key")
    val bok = element_at(col("attributes"), "business_object_key")
    to_json(struct(
      col("broker_id").as("broker_id"),
      col("id").as("broker_msg_id"),
      concat(col("broker_id"), lit("_"), col("id")).as("unique_id"),
      bsk.as("business_source_key"),
      bok.as("business_object_key"),
      when(bsk.isNull, lit(null).cast("string"))
        .otherwise(concat(bsk, lit("_"), bok)).as("index_source_key"),
      col("ordering_key").as("ordering_key"),
      map_filter(col("attributes"),
        (k, _) => !k.isin("business_source_key", "business_object_key"))
        .as("additional_metadata"),
      col("location_key").as("location_key"),
      (col("location_position") - 1).cast("string").as("location_position"),
      date_format(col("publish_time"), TsFormat).as("publish_time"),
      date_format(col("ingestion_time"), TsFormat).as("ingestion_time")))
  }

  /** D3/K4: the indexer-topic publish payload, one JSON value per message. */
  def indexerPayload(messages: DataFrame): DataFrame =
    messages.select(indexDoc.as("value"))

  // ------------------------------------------------------------ indexer side

  /** D4 strict JSON decode with the per-row verdict attached: `doc` (the
    * parsed wire doc) and `err` (null ⇔ valid). One scan — callers needing
    * both valid counts and DL counts aggregate this directly instead of
    * walking the topic twice through the JSON parse.
    */
  def checkedTopic(topic: DataFrame): DataFrame = {
    val decoded = topic
      .withColumn("doc", from_json(col("value"), IndexDocWireSchema))
      .withColumn("keys", expr("json_object_keys(value)"))
    val unknown = array_except(
      col("keys"), array(KnownKeys.map(lit): _*))
    val missing = RequiredKeys
      .map(k => when(col("doc").getField(k).isNull, lit(k)))
      .foldLeft(array().cast("array<string>"))((acc, c) =>
        concat(acc, array_compact(array(c))))
    decoded
      .withColumn("err",
        when(col("doc").isNull || col("keys").isNull,
          lit("deserialization_error: malformed JSON"))
          .when(size(unknown) > 0,
            concat(lit("validation_error: unknown keys "),
              concat_ws(",", unknown)))
          .when(size(missing) > 0,
            concat(lit("validation_error: missing required "),
              concat_ws(",", missing))))
  }

  /** D4 strict JSON decode + T7 validation split
    * (persistor/internal/indexer/transform.go:54-82): a doc is valid iff
    * it parses, carries no unknown keys, and has every required key
    * non-null. Returns (valid wire docs, dead-lettered rows).
    */
  def validateTopic(topic: DataFrame): (DataFrame, DataFrame) = {
    val checked = checkedTopic(topic)
    val good = checked.filter(col("err").isNull).select(col("doc.*"))
    val bad = checked.filter(col("err").isNotNull).select(
      col("value"),
      split_part(col("err"), lit(": "), lit(1)).as("dead_letter_error_category"),
      col("err").as("dead_letter_error_reason"),
      lit("indexer").as("dead_letter_error_source"))
    (good, bad)
  }

  /** T8 `FormatData` (formatter.go:37-85): wire strings → typed index
    * columns; location_position converts atoi+1 back to 1-based
    * (sender.go:186-192); confirmation_flag initialized false. Output
    * columns = IndexModel.Columns.
    */
  def formatIndex(goodDocs: DataFrame): DataFrame =
    goodDocs
      .withColumn("meta_k", element_at(col("additional_metadata"), "k"))
      .withColumn("location_position",
        (col("location_position").cast("long") + 1).cast("long"))
      .withColumn("publish_time", to_timestamp(col("publish_time"), TsFormat))
      .withColumn("ingestion_time", to_timestamp(col("ingestion_time"), TsFormat))
      .withColumn("confirmation_flag", lit(false))
      .select(IndexModel.Columns.map(col): _*)

  // ------------------------------------------------------------ batch driver

  /** One micro-batch end-to-end (the `HandleBatch` analog,
    * persistor.go:96-205). All writes land under `batch_id=<id>` with
    * dynamic partition overwrite → idempotent reprocessing (W2).
    */
  def persistBatch(
      batch: DataFrame,
      workDir: String,
      batchId: Long,
      metrics: Option[graft.operators.MetricsRegistry] = None): Unit = {
    val spark = batch.sparkSession
    // two sinks consume the envelope (records + indexer topic); persist it
    // so the position window runs once per batch, not once per sink
    val messages = messagesFromEvents(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try persistSinks(spark, messages, workDir, batchId, metrics)
    finally messages.unpersist()
  }

  private def persistSinks(
      spark: SparkSession,
      messages: DataFrame,
      workDir: String,
      batchId: Long,
      metrics: Option[graft.operators.MetricsRegistry]): Unit = {

    // K1/D1: records as Avro OCF, time-partitioned by the storage mask
    // (T1). Repartition onto the partition keys so each Hive partition is
    // written by one task — the blob-per-mini-batch layout, not 32
    // shards of every partition.
    val mask = Persist.parseMask("year/month/day")
    val records = Persist
      .withPartitionColumns(messages, mask, col("publish_time"))
      .withColumn("batch_id", lit(batchId))
      .withColumn("metadata", recordMetadata)
      .select(col("batch_id"), col("year"), col("month"), col("day"),
        col("id"), col("data"), col("metadata"))
    records
      .repartition(col("year"), col("month"), col("day"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "year", "month", "day")
      .format(AvroFormat)
      .option("avroSchema", PersistorRecordAvroSchema)
      .save(s"$workDir/records")

    // K4/D3: indexer-topic publish (durable file topic)
    indexerPayload(messages)
      .withColumn("batch_id", lit(batchId))
      .coalesce(8)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$workDir/indexer_topic")

    // Indexer: consume the topic THIS batch wrote (real read-back), split,
    // append index + dead letters.
    val topic = spark.read.parquet(s"$workDir/indexer_topic")
      .filter(col("batch_id") === batchId)
    val (good, bad) = validateTopic(topic)
    formatIndex(good)
      .withColumn("batch_id", lit(batchId))
      .repartition(col("broker_id"))
      .sortWithinPartitions(col("publish_time"), col("unique_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "broker_id")
      .parquet(s"$workDir/index")
    // explicit batch_id=<id> path (not partitionBy): an all-valid batch
    // still writes one empty schema-bearing file, so the DL topic is
    // always readable; overwriting the subdir keeps reprocessing idempotent.
    // repartition(1) single-tasks the write, which is bounded by the batch
    // size (≤ settings.batchSize msgs, 5 000 by default — a poison batch is
    // at worst one batch of rows); if batch size is ever raised 100-1000×,
    // key this off the DL row count instead of shipping a one-task write
    bad
      .repartition(1)
      .write.mode("overwrite")
      .parquet(s"$workDir/dead_letter/batch_id=$batchId")

    metrics.foreach(updateRegistry(_, messages, bad))
  }

  /** The reference updates its Prometheus registry after every handled
    * batch (`UpdateSuccessMetrics`/`UpdateFailureMetrics`,
    * common/metrics.go:106-146, driven from the executor ack/nack paths):
    * success = the messages this batch persisted (count, payload bytes,
    * per-message now − ingestion_time ms), failure = the docs the indexer
    * dead-lettered. One registry models the reference's two per-component
    * registries composed. The collects are BATCH-sized (≤ the batch-size
    * setting — the same bound the one-task DL write relies on), never
    * corpus-sized; "now" is the registry's own injectable clock so window
    * expiry stays testable. DL rows carry no broker envelope (a malformed
    * doc has no parseable ingestion_time), so failure times are
    * unobserved — counters only.
    */
  private[graft] def updateRegistry(
      m: graft.operators.MetricsRegistry,
      messages: DataFrame,
      bad: DataFrame): Unit = {
    val now = m.nowMillis
    val s = messages.agg(
      count(lit(1)),
      coalesce(sum(octet_length(col("data"))), lit(0L)),
      collect_list((lit(now) - unix_millis(col("ingestion_time")))
        .cast("double"))).head()
    // both paths guard on count > 0: an empty batch handled nothing, so
    // it must not touch the registry at all (no counter adds, but also no
    // clock tick / window expiry — expiry is driven by real updates and
    // by scrapes, exactly like the reference's registry, which is only
    // ever updated from handled messages)
    if (s.getLong(0) > 0L) m.updateSuccess(s.getLong(0), s.getLong(1), s.getSeq[Double](2))
    val f = bad.agg(
      count(lit(1)),
      coalesce(sum(octet_length(col("value"))), lit(0L))).head()
    if (f.getLong(0) > 0L) m.updateFailure(f.getLong(0), f.getLong(1))
  }

  /** W2's upstream half: an at-least-once broker REDELIVERS messages (the
    * reference acks only after blob+index success, persistor.go:147-165, so
    * a crashed instance's batch comes back). Batch-id overwrite makes
    * same-batch reprocessing idempotent; redelivery into a LATER batch
    * needs id-level dedup. Streaming: `dropDuplicatesWithinWatermark`
    * keeps one state entry per id only inside the watermark horizon —
    * bounded state at any rate, the exact broker-redelivery window
    * semantics. Batch frames take the plain distinct-by-id.
    * Compose as `runStream(..., prepare = dedupWithinWatermark(...))`.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      delay: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  // ---------------------------------------------------------- entry points

  private val ran = new ConcurrentHashMap[String, String]()

  def workRoot: String =
    sys.env.getOrElse("GRAFT_WORK_DIR", s"${sys.props("user.dir")}/target/graft-work")

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }

  /** Run the whole pipeline once per JVM per testdata dir (one logical
    * batch), returning the work dir with records/indexer_topic/index/
    * dead_letter under it. Fresh JVMs (every driver run) rebuild from
    * scratch, so stale materializations cannot outlive code changes.
    */
  def ensureRun(spark: SparkSession, sfDir: String): String =
    ran.computeIfAbsent(sfDir, { dir =>
      val wd = s"$workRoot/persist-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      deleteRecursively(java.nio.file.Paths.get(wd))
      persistBatch(Tables(spark, dir).events, wd, 0L)
      wd
    })

  /** W1: the same pipeline as a Structured Streaming query — file source
    * micro-batches (maxFilesPerTrigger), checkpointed `foreachBatch`,
    * `Trigger.AvailableNow` to drain the backlog and stop (the bounded
    * analog of the reference's 30 s batch-timeout loop). Reprocessing a
    * batch after a crash overwrites its own `batch_id` partition (W2).
    */
  /** Shared stream construction for [[runStream]]/[[runStreamAsync]]:
    * file source with the given trigger, checkpointed `foreachBatch` over
    * [[persistBatch]], batch errors policed by the optional W4 budget
    * (run.go:159-187: tolerate under budget — redelivery is the upstream
    * broker's job; stop the query once exceeded).
    */
  private def startQuery(
      spark: SparkSession,
      eventsPath: String,
      workDir: String,
      maxFilesPerTrigger: Int,
      prepare: DataFrame => DataFrame,
      trigger: Trigger,
      flowControl: Option[graft.operators.FlowControl],
      metrics: Option[graft.operators.MetricsRegistry] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(eventsPath).schema
    val source = prepare(spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsPath))
    source.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$workDir/checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try persistBatch(batch, workDir, batchId, metrics)
        catch {
          case e: Throwable =>
            flowControl match {
              case Some(fc) =>
                fc.record()
                if (fc.shouldStop) throw e
              case None => throw e
            }
        }
      }
      .start()
  }

  def runStream(
      spark: SparkSession,
      eventsPath: String,
      workDir: String,
      maxFilesPerTrigger: Int = 1,
      prepare: DataFrame => DataFrame = identity,
      flowControl: Option[graft.operators.FlowControl] = None,
      metrics: Option[graft.operators.MetricsRegistry] = None): Unit =
    startQuery(spark, eventsPath, workDir, maxFilesPerTrigger, prepare,
      Trigger.AvailableNow(), flowControl, metrics)
      .awaitTermination()

  /** W7 graceful drain (persistor.go:202-205, run.go:66-72: the handler
    * context outlives the run context so in-flight batches finish): start
    * the same pipeline on a continuous trigger and return the handle; a
    * shutdown calls [[drain]], which lets every buffered micro-batch
    * complete before stopping — no in-flight batch is severed.
    */
  def runStreamAsync(
      spark: SparkSession,
      eventsPath: String,
      workDir: String,
      maxFilesPerTrigger: Int = 1,
      prepare: DataFrame => DataFrame = identity): org.apache.spark.sql.streaming.StreamingQuery =
    startQuery(spark, eventsPath, workDir, maxFilesPerTrigger, prepare,
      Trigger.ProcessingTime(0L), flowControl = None)

  /** W7: process everything already ingested, then stop. */
  def drain(query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    query.processAllAvailable()
    query.stop()
    query.awaitTermination()
  }

  // ------------------------------------------------------------- read-back

  /** D2: Avro OCF read-back of the written records, with blob identity
    * recovered from the stored metadata (location_key + 0-based position
    * → 1-based), ready for the positional join (J2).
    */
  def readRecords(spark: SparkSession, workDir: String): DataFrame =
    spark.read.format(AvroFormat).load(s"$workDir/records")
      .select(
        element_at(col("metadata"), "location_key").as("location_key"),
        (element_at(col("metadata"), "location_position").cast("long") + 1)
          .as("location_position"),
        col("id"),
        col("data"),
        col("metadata"))
}
