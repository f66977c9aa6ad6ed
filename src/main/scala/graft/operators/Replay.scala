package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Replay-side operators: the resubmitter's query → fetch → positional-join
  * → repackage → ordered-publish pipeline (SURVEY §3.3), minus the HTTP and
  * channel plumbing that Spark's task scheduling replaces.
  */
object Replay {

  /** J1 `groupByLocationKey` (resubmitter-api/lib/resubmitter/util.go:30-40):
    * one fetch job per blob. Returns per-blob row counts and the position
    * range — the job manifest a fetch stage would consume.
    */
  def fetchJobs(index: DataFrame): DataFrame =
    index
      .groupBy(col("location_key"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("location_position")).as("min_pos"),
        max(col("location_position")).as("max_pos"))

  /** J2 positional join (util.go:42-60): re-associate deserialized blob
    * records with their index rows via (blob, position) — the reference
    * indexes an in-memory array with `location_position - 1`; here it is an
    * equi hash join on the composite key, broadcastable when the queried
    * index slice is small.
    *
    * `records` must carry `location_key` and `location_position` columns
    * (stored at write time — SURVEY §7.4 item 2: never rely on file order).
    */
  def positionalJoin(records: DataFrame, index: DataFrame, broadcastIndex: Boolean = false): DataFrame = {
    val idx = if (broadcastIndex) broadcast(index) else index
    records.join(idx, Seq("location_key", "location_position"), "inner")
  }

  /** T13 `packageMetadata` (util.go:62-82): flatten an index row back into
    * the attribute map that gets republished: additional_metadata ∪
    * {business keys} ∪ {ordering_key if nonempty}. Null-valued entries are
    * dropped, like the reference only sets keys it has.
    */
  def repackagedMetadata(index: DataFrame): DataFrame =
    index.withColumn(
      "attributes",
      map_filter(
        map_concat(
          col("additional_metadata"),
          map(
            lit("business_source_key"), col("business_source_key"),
            lit("business_object_key"), col("business_object_key"),
            lit("ordering_key"),
            when(col("ordering_key") === "", lit(null).cast("string"))
              .otherwise(col("ordering_key")))),
        (_, v) => v.isNotNull))

  /** W6 ordering-key publish groups (resubmitter_job.go:387-455): per-key
    * sequential order, keyless records independent. The publish order per
    * key is (location_key, location_position) — materialized here as an
    * ordered id list per group so the contract is testable; the real sink
    * path is `repartition(ordering_key).sortWithinPartitions(...)` feeding a
    * per-partition-ordered sink (Kafka).
    *
    * The keyless group (`ordering_key = ""`) is EXEMPT from the order
    * list: the reference publishes keyless records fully in parallel with
    * no mutual order (resubmitter_job.go:408-451), and by construction a
    * third of the corpus is keyless — an unbounded `collect_list` over
    * that group would funnel it into one task and one giant string at
    * scale. Its `publish_order` is null; the count still reports. The
    * null is produced INSIDE the aggregate input (collect_list skips
    * nulls), so the keyless group's buffer never accumulates members.
    */
  /** A record with no ordering key: the reference's zero value is the
    * empty string (resubmitter_job.go:418 `groupedRecords[""]`), and a
    * NULL key from un-normalized external data means the same thing —
    * both publish fully parallel. Treating null as keyed would silently
    * DROP it from the keyed/keyless split (`=!= ""` and `=== ""` are both
    * null-valued on null input).
    */
  private def keylessKey: Column =
    col("ordering_key").isNull || col("ordering_key") === ""

  /** `extraAggs` ride the same grouping (e.g. a payload-mass sum when
    * verifying a publish plan) so callers never re-implement the
    * keyless-exemption subtleties.
    */
  def orderingGroups(index: DataFrame, extraAggs: Column*): DataFrame = {
    val keyless = keylessKey
    val orderAgg =
      when(keyless, lit(null).cast("string"))
        .otherwise(concat_ws(",",
          transform(
            array_sort(collect_list(when(keyless, lit(null)).otherwise(struct(
              col("location_key"), col("location_position"), col("unique_id"))))),
            e => e.getField("unique_id")))).as("publish_order")
    index
      .groupBy(col("ordering_key"))
      .agg(count(lit(1)).as("n"), (orderAgg +: extraAggs): _*)
  }

  /** Keyed rows only (`ordering_key` nonempty), physically partitioned by
    * ordering key and sorted by publish position within partitions — the
    * shape an order-preserving per-partition sink consumes directly.
    */
  private[operators] def orderedKeyed(index: DataFrame): DataFrame =
    index
      .filter(!keylessKey)
      .repartition(col("ordering_key"))
      .sortWithinPartitions(
        col("ordering_key"), col("location_key"), col("location_position"))

  /** Keyless rows (`ordering_key = ""`), salted round-robin across the
    * session's shuffle-partition count. No sort: the reference gives
    * keyless records no mutual order (resubmitter_job.go:408-451), so
    * spreading them evenly is the whole contract — hash-partitioning them
    * by key would put a third of the corpus in ONE task.
    */
  private[operators] def saltedKeyless(index: DataFrame): DataFrame =
    index
      .filter(keylessKey)
      .repartition(index.sparkSession.sessionState.conf.numShufflePartitions)

  /** The scale-path form of W6: keyed rows partitioned by ordering key and
    * sorted within partitions; keyless rows salted round-robin with no
    * order (reference semantics — see [[saltedKeyless]]). The union keeps
    * both branches' physical partitioning: an order-preserving sink reads
    * the keyed partitions sequentially and the keyless ones in parallel.
    */
  def orderedForPublish(index: DataFrame): DataFrame =
    orderedKeyed(index).unionByName(saltedKeyless(index))

  /** T9 `ObserveError` (persistor/internal/indexer/transform.go:32-42):
    * aggregate identical error messages with counts.
    */
  def errorCounts(errors: DataFrame, message: Column): DataFrame =
    errors.groupBy(message.as("message")).agg(count(lit(1)).as("n"))

  /** A7 error-set union (resubmitter-api/lib/resubmitter/util.go:93-117):
    * the reference fans in N error channels; here error frames from
    * different stages union by column name, tolerating stage-specific extra
    * columns (missing ones null-fill).
    */
  def errorUnion(errors: Seq[DataFrame]): DataFrame = {
    require(errors.nonEmpty, "errorUnion needs at least one error frame")
    errors.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Delivered records and per-stage tagged failures of one replay run. */
  final case class ReplayOutcome(delivered: DataFrame, errors: DataFrame)

  /** End-to-end replay with the reference's three-stage error taxonomy
    * (resubmitter_job.go:303 `storage_error`, :345 `deserialization_error`,
    * :401 `publish_error`): stages are strictly sequential — a blob that
    * fails fetch never reaches deserialization, and a record of a failed
    * blob never attempts publish. `fetchFault` and `deserFault` are
    * per-BLOB predicates over index columns (the reference tags ALL of a
    * fetch/packaging job's messages, tagAsFailures(job.messages));
    * `publishFault` is per-record (each record publishes alone,
    * resubmitter_job.go:391-415). Errors fan in through [[errorUnion]]
    * exactly like the reference's error channels (util.go:93-117).
    *
    * All paths are filters over one index scan plus the positional join —
    * no extra shuffle beyond the delivery join itself.
    */
  def replayWithFaults(
      index: DataFrame,
      records: DataFrame,
      fetchFault: Column,
      deserFault: Column,
      publishFault: Column): ReplayOutcome = {
    val storageFailed = index.filter(fetchFault)
      .select(col("unique_id"), lit("storage_error").as("reason"))
    val fetched = index.filter(!fetchFault)
    val deserFailed = fetched.filter(deserFault)
      .select(col("unique_id"), lit("deserialization_error").as("reason"))
    val deserialized = fetched.filter(!deserFault)
    val joined = positionalJoin(records, deserialized)
    val publishFailed = joined.filter(publishFault)
      .select(col("unique_id"), lit("publish_error").as("reason"))
    val delivered = joined.filter(!publishFault)
    ReplayOutcome(
      delivered,
      errorUnion(Seq(storageFailed, deserFailed, publishFailed)))
  }

  /** J3 singleton short-circuit (resubmitter-api/lib/resubmitter/
    * resubmitter.go:166-201): a blob whose index slice has exactly one row
    * with no position is treated as one whole record — the reference skips
    * Avro deserialization; here the equivalent is joining that row to the
    * blob's single record on `location_key` alone. Positioned rows take the
    * normal positional join; both legs are one shuffle on location_key (or
    * broadcast for selective replays).
    */
  def positionalJoinWithSingletons(
      records: DataFrame,
      index: DataFrame,
      broadcastIndex: Boolean = false): DataFrame = {
    val perBlob = Window.partitionBy(col("location_key"))
    val tagged = index.withColumn("_blob_rows", count(lit(1)).over(perBlob))
    val singletons = tagged
      .filter(col("_blob_rows") === 1 && col("location_position").isNull)
      .drop("_blob_rows", "location_position")
    val positioned = tagged
      .filter(col("location_position").isNotNull)
      .drop("_blob_rows")
    val sIdx = if (broadcastIndex) broadcast(singletons) else singletons
    positionalJoin(records, positioned, broadcastIndex)
      .unionByName(
        records.drop("location_position")
          .join(sIdx, Seq("location_key"), "inner"),
        allowMissingColumns = true)
  }

  /** The rows [[positionalJoinWithSingletons]] can NOT deliver: a null
    * position in a multi-record blob is ambiguous (the reference's atoi
    * would error the record, resubmitter.go:186-191). Route these to the
    * dead-letter/error path — they never silently vanish.
    */
  def unjoinable(index: DataFrame): DataFrame = {
    val perBlob = Window.partitionBy(col("location_key"))
    index
      .withColumn("_blob_rows", count(lit(1)).over(perBlob))
      .filter(col("location_position").isNull && col("_blob_rows") > 1)
      .drop("_blob_rows")
  }
}
