package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The replay publish sink — the engine's analog of the reference's broker
  * publishers (K6 Kafka resubmitter-api/lib/publisher/kafka/kafka.go:204-229,
  * K7 PubSub pubsub.go:146-176, K8 Service Bus servicebus.go:35-82, wired by
  * the K9 factory sender/initialization.go:35-91).
  *
  * No broker connector ships in this environment, so the topic is a durable
  * file topic; what the operator guarantees is exactly what those
  * publishers guarantee (W6, resubmitter_job.go:387-455):
  *
  *   - records sharing an ordering key are published strictly in
  *     (location_key, location_position) order — materialized as the
  *     explicit `publish_seq` so ANY order-preserving sink (Kafka partition,
  *     PubSub ordering key) can replay it;
  *   - keyless records (ordering_key = "") have no mutual order and NO
  *     publish_seq (null): the reference publishes them fully in parallel
  *     (resubmitter_job.go:408-451). They are salted round-robin instead of
  *     hash-partitioned — by construction a third of the corpus is keyless
  *     (one null business key in three), and sequencing that group would be
  *     a single-task sort of a third of 100 TB;
  *   - the keyed physical layout is `repartition(ordering_key)` +
  *     `sortWithinPartitions` (Replay.orderedKeyed), the shape a
  *     per-partition-ordered sink consumes directly — the window below
  *     reuses that same hash partitioning, so no extra shuffle happens on
  *     the keyed branch.
  */
object Publisher {

  /** The per-key publish sequence — explicit, deterministic replay order
    * for keyed rows; null for keyless rows (fully parallel, no order).
    */
  def withPublishSeq(index: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ordering_key"))
      .orderBy(col("location_key"), col("location_position"), col("unique_id"))
    Replay.orderedKeyed(index)
      .withColumn("publish_seq", row_number().over(w).cast("long"))
      .unionByName(
        Replay.saltedKeyless(index)
          .withColumn("publish_seq", lit(null).cast("long")))
  }

  /** Publish the replay set to a file topic: key, sequence, and the
    * republished attribute map flattened as the message value.
    */
  def publishOrdered(index: DataFrame, topicDir: String): Unit =
    withPublishSeq(Replay.repackagedMetadata(index))
      .select(
        col("ordering_key"), col("publish_seq"), col("unique_id"),
        to_json(col("attributes")).as("value"))
      .write.mode("overwrite").parquet(topicDir)

  /** Read a published topic back. */
  def readTopic(spark: SparkSession, topicDir: String): DataFrame =
    spark.read.parquet(topicDir)
}
