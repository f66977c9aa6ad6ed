package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Persist-side projections: partition-path templating, version batching,
  * dead-letter splitting, message sizing.
  *
  * Reference behaviors re-expressed (SURVEY §2.3):
  *   - T1 `GenerateBlobName` mask parsing/derivation
  *     (persistor/internal/persistor/storage.go:103-189): mask members are
  *     either time parts (`year|month|day|hour`) or `{attrKey}` attribute
  *     references; a missing attribute yields the literal `"unknown"`.
  *   - T2 `BatchByVersions` (version_batching.go:75-117): group messages by
  *     an N-tuple of attribute values, missing → `"unknown"`.
  *   - K5/W3 dead-letter split (sender.go:55-85): failed rows carry
  *     deadLetterErrorCategory/Reason/Source alongside their payload.
  *   - T14 message size (common/calculate_message_size.go:21-39):
  *     payload bytes + Σ(len(key)+len(value)) over string attributes.
  *
  * Instead of string-concatenated blob paths, partition values become real
  * columns and `write.partitionBy(...)` lays out Hive-style directories —
  * which is what gives free partition pruning on read at 100 TB (SURVEY §4).
  */
object Persist {

  sealed trait MaskMember { def columnName: String }
  final case class TimeMember(part: String) extends MaskMember {
    val columnName: String = part
  }
  final case class AttrMember(key: String) extends MaskMember {
    val columnName: String = key
  }

  private val TimeParts = Map(
    "year" -> "yyyy", "month" -> "MM", "day" -> "dd", "hour" -> "HH")

  /** Default mask, as shipped (persistor/config/persistor.toml:47). */
  val DefaultMask = "year/month/day/hour"

  /** Parse a storage mask like `"year/month/{color}/day"`. */
  def parseMask(mask: String): Seq[MaskMember] =
    mask.split("/").toIndexedSeq.map {
      case m if TimeParts.contains(m) => TimeMember(m)
      case m if m.startsWith("{") && m.endsWith("}") && m.length > 2 =>
        AttrMember(m.substring(1, m.length - 1))
      case m => throw new IllegalArgumentException(s"invalid mask member: $m")
    }

  /** Add one column per mask member. Time members derive (zero-padded) from
    * `clock`; attribute members look up `attrs` and default to "unknown".
    * The reference stamps wall-clock UTC (storage.go:104); the clock is a
    * Column here so tests and replays are deterministic (SURVEY §7.4 item 4).
    */
  def withPartitionColumns(
      df: DataFrame,
      mask: Seq[MaskMember],
      clock: Column,
      attrs: Map[String, Column] = Map.empty): DataFrame =
    mask.foldLeft(df) {
      case (d, TimeMember(part)) =>
        d.withColumn(part, date_format(clock, TimeParts(part)))
      case (d, AttrMember(key)) =>
        val v = attrs.getOrElse(key, lit(null).cast("string"))
        d.withColumn(key, coalesce(v, lit("unknown")))
    }

  /** The blob-path string a mask produces — kept for location_key fidelity
    * with the reference's `prefix/member1/member2/.../name` layout
    * (storage.go:103-122). Call after [[withPartitionColumns]].
    */
  def partitionPath(prefix: String, mask: Seq[MaskMember]): Column =
    concat_ws("/", lit(prefix) +: mask.map(m => col(m.columnName)): _*)

  /** T2: materialize version-key columns (missing → "unknown"). Writing
    * with `partitionBy(keys)` afterwards reproduces one mini-batch per
    * version group, with Spark tasks as the parallelism unit instead of
    * goroutines (SURVEY §3.1).
    */
  def withVersionColumns(df: DataFrame, keys: Map[String, Column]): DataFrame =
    keys.foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, coalesce(c, lit("unknown")))
    }

  /** K5: project failed rows into dead-letter shape — original identity plus
    * the three DL attributes the reference adds (sender.go:63-71).
    */
  def deadLetter(
      failed: DataFrame,
      idCol: Column,
      category: String,
      reason: Column,
      source: String): DataFrame =
    failed.select(
      idCol.as("unique_id"),
      lit(category).as("dead_letter_error_category"),
      reason.as("dead_letter_error_reason"),
      lit(source).as("dead_letter_error_source"))

  /** T14: payload bytes + Σ(len(key)+len(value)) over the attribute map. */
  def messageSize(data: Column, attributes: Column): Column =
    length(data).cast("long") +
      aggregate(
        map_entries(attributes),
        lit(0L),
        (acc, e) => acc + length(e.getField("key")) + length(e.getField("value")))

  /** T3 `ZeroToN` (persistor/internal/persistor/persistor.go:193-200):
    * identity positions 0..n-1 within each blob when version batching is
    * disabled. Positions are per-blob (`partitionBy(blobKey)`), never a
    * global window — a global ordering would serialize the whole batch
    * through one task at scale.
    */
  def zeroToN(df: DataFrame, blobKey: Column, orderBy: Column): DataFrame =
    df.withColumn("position",
      (row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(blobKey).orderBy(orderBy)) - 1).cast("long"))

  /** T10 `onlyStrings` (sender.go:210-223): the reference drops attribute
    * values that aren't strings. Spark maps are homogeneous
    * (`MapType(String,String)`), so the analog is dropping entries whose
    * value is null — i.e. values that failed an upstream cast to string.
    */
  def onlyStrings(attributes: Column): Column =
    map_filter(attributes, (_, v) => v.isNotNull)

  /** A8 `MessagesGoodBad` *intent* (SURVEY §2.5 — the reference indexes with
    * the wrong variable at indexer.go:119-123; we implement the intended
    * split): good = batch minus failed ids, bad = batch ∩ failed ids.
    * Anti/semi joins broadcast the (small) failed set — no fact shuffle.
    */
  def goodBadSplit(batch: DataFrame, failedIds: DataFrame, on: String): (DataFrame, DataFrame) =
    (batch.join(broadcast(failedIds), Seq(on), "left_anti"),
      batch.join(broadcast(failedIds), Seq(on), "left_semi"))
}
