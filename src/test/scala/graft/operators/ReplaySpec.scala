package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replay-side tests: the positional join (J2), fetch-job grouping (J1),
  * metadata repackaging (T13), and the ordering-key publish contract (W6)
  * in its scale-safe `orderedForPublish` form — asserting actual
  * within-partition physical order, the property an order-preserving sink
  * (Kafka per partition) relies on.
  */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private lazy val index = Seq(
    ("b_1", "blob-0", 1L, "u1", Map("k" -> "1"), "bsk1", "bok1"),
    ("b_2", "blob-0", 2L, "", Map("k" -> "2"), null, "bok2"),
    ("b_3", "blob-1", 1L, "u1", Map("k" -> "3"), "bsk2", "bok3"),
    ("b_4", "blob-1", 2L, "u2", Map("k" -> "4"), "bsk1", "bok4"))
    .toDF("unique_id", "location_key", "location_position", "ordering_key",
      "additional_metadata", "business_source_key", "business_object_key")

  private lazy val records = Seq(
    ("blob-0", 1L, "p1"), ("blob-0", 2L, "p2"),
    ("blob-1", 1L, "p3"), ("blob-1", 2L, "p4"), ("blob-1", 3L, "orphan"))
    .toDF("location_key", "location_position", "payload")

  test("positionalJoin aligns records to index rows on (blob, position)") {
    val out = Replay.positionalJoin(records, index, broadcastIndex = true)
      .select("unique_id", "payload").as[(String, String)].collect().toMap
    assert(out === Map("b_1" -> "p1", "b_2" -> "p2", "b_3" -> "p3", "b_4" -> "p4"))
  }

  test("fetchJobs manifests one job per blob with the position range") {
    val out = Replay.fetchJobs(index).orderBy("location_key")
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(("blob-0", 2L, 1L, 2L), ("blob-1", 2L, 1L, 2L)))
  }

  test("repackagedMetadata flattens business keys and drops empty ordering keys (T13)") {
    val out = Replay.repackagedMetadata(index)
      .select("unique_id", "attributes")
      .as[(String, Map[String, String])].collect().toMap
    assert(out("b_1") === Map("k" -> "1", "business_source_key" -> "bsk1",
      "business_object_key" -> "bok1", "ordering_key" -> "u1"))
    // null bsk and empty ordering key are omitted, like the reference
    assert(out("b_2") === Map("k" -> "2", "business_object_key" -> "bok2"))
  }

  test("orderedForPublish physically sorts each KEYED partition by key and position (W6)") {
    val big = (1 to 500).map { i =>
      (s"m_$i", if (i % 5 == 0) "" else s"u${i % 7}", s"blob-${i % 13}", (i % 37).toLong)
    }.toDF("unique_id", "ordering_key", "location_key", "location_position")
    val ordered = Replay.orderedForPublish(big)
      .select("ordering_key", "location_key", "location_position")
      .as[(String, String, Long)]
    // keyed rows inside each partition are sorted — the property an
    // order-preserving per-partition sink consumes; keyless rows carry no
    // order contract (reference: fully parallel)
    val partitionsSorted = ordered.mapPartitions { it =>
      val rows = it.toVector.filter(_._1.nonEmpty)
      Iterator.single(rows == rows.sortBy(identity))
    }.collect()
    assert(partitionsSorted.forall(identity))
    // every nonempty key lands in exactly one partition
    val keyPartitions = ordered.mapPartitions { it =>
      it.collect { case (k, _, _) if k.nonEmpty => k }.toSet.iterator
    }.rdd.mapPartitionsWithIndex((i, it) => it.map(k => (k, i)))
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(keyPartitions.values.forall(_ == 1))
  }

  test("keyless third of the corpus spreads evenly, never one skewed partition (W6)") {
    // 1/3 keyless — the production shape (one null business key in three);
    // pre-skew the input so the keyless rows START in a single partition
    // and only the salting can spread them
    val big = (1 to 3000).map { i =>
      (s"m_$i", if (i % 3 == 0) "" else s"u${i % 200}", s"blob-${i % 13}", (i % 37).toLong)
    }.toDF("unique_id", "ordering_key", "location_key", "location_position")
      .repartition(col("ordering_key"))
    val perPartKeyless = Replay.orderedForPublish(big)
      .select("ordering_key").as[String]
      .mapPartitions(it => Iterator.single(it.count(_.isEmpty)))
      .collect().filter(_ > 0)
    val mean = 1000.0 / perPartKeyless.length
    // salting spreads the keyless third over the full shuffle-partition
    // fan-out (4 in the test session, 32+ in production)
    assert(perPartKeyless.length >= spark.sessionState.conf.numShufflePartitions,
      s"keyless rows concentrated in ${perPartKeyless.length} partitions")
    assert(perPartKeyless.max <= 2 * mean,
      s"keyless skew: max ${perPartKeyless.max} vs mean $mean")
  }

  test("NULL ordering keys publish as keyless — never silently dropped (W6)") {
    val idx = Seq(
      ("k_1", Some("u1"), "blob-0", 1L),
      ("n_1", None: Option[String], "blob-0", 2L),
      ("e_1", Some(""), "blob-1", 1L))
      .toDF("unique_id", "ordering_key", "location_key", "location_position")
    val out = Publisher.withPublishSeq(idx)
      .select("unique_id", "publish_seq")
      .as[(String, Option[Long])].collect().toMap
    assert(out.keySet === Set("k_1", "n_1", "e_1")) // nothing vanished
    assert(out("k_1") === Some(1L))
    assert(out("n_1") === None && out("e_1") === None) // both keyless forms
    assert(Replay.orderedForPublish(idx).count() === 3)
  }

  test("withPublishSeq sequences keyed rows per key; keyless rows get none (W6)") {
    val out = Publisher.withPublishSeq(index)
      .select("unique_id", "ordering_key", "publish_seq")
      .as[(String, String, Option[Long])].collect().toList
    val byId = out.map(r => r._1 -> r._3).toMap
    // u1 owns b_1 (blob-0 pos 1) then b_3 (blob-1 pos 1); u2 owns b_4
    assert(byId("b_1") === Some(1L) && byId("b_3") === Some(2L))
    assert(byId("b_4") === Some(1L))
    // the keyless record is published with NO sequence (fully parallel,
    // resubmitter_job.go:408-451)
    assert(byId("b_2") === None)
    assert(out.size === 4)
  }

  test("replayWithFaults tags failures by stage, strictly sequential (A7 taxonomy)") {
    // blob-f fails fetch AND would fail deserialize -> storage wins;
    // blob-d fails deserialize; r_pub fails publish; rest deliver.
    val idx = Seq(
      ("f_1", "blob-f", 1L), ("f_2", "blob-f", 2L),
      ("d_1", "blob-d", 1L),
      ("r_pub", "blob-ok", 1L), ("r_ok", "blob-ok", 2L))
      .toDF("unique_id", "location_key", "location_position")
    val recs = Seq(
      ("blob-f", 1L, "x"), ("blob-f", 2L, "x"), ("blob-d", 1L, "x"),
      ("blob-ok", 1L, "x"), ("blob-ok", 2L, "x"))
      .toDF("location_key", "location_position", "payload")
    val out = Replay.replayWithFaults(idx, recs,
      fetchFault = col("location_key") === "blob-f",
      deserFault = col("location_key").isin("blob-f", "blob-d"),
      publishFault = col("unique_id") === "r_pub")
    val errs = out.errors.as[(String, String)].collect().toMap
    assert(errs === Map(
      "f_1" -> "storage_error", "f_2" -> "storage_error",
      "d_1" -> "deserialization_error", "r_pub" -> "publish_error"))
    assert(out.delivered.select("unique_id").as[String].collect().toSeq === Seq("r_ok"))
  }

  test("errorCounts aggregates identical error messages (T9)") {
    val errs = Seq("x", "x", "y").toDF("m")
    val out = Replay.errorCounts(errs, col("m")).orderBy("message")
      .as[(String, Long)].collect()
    assert(out === Array(("x", 2L), ("y", 1L)))
  }

  test("errorUnion fans in stage error frames, null-filling missing columns (A7)") {
    val storage = Seq(("m1", "storage_error")).toDF("unique_id", "category")
    val publish = Seq(("m2", "publish_error", "kafka"))
      .toDF("unique_id", "category", "sink")
    val out = Replay.errorUnion(Seq(storage, publish)).orderBy("unique_id")
      .as[(String, String, Option[String])].collect()
    assert(out === Array(("m1", "storage_error", None), ("m2", "publish_error", Some("kafka"))))
  }

  test("singleton blobs join on location alone; positioned blobs positionally (J3)") {
    val idx = Seq(
      ("s_1", "blob-s", None: Option[Long], "u1"),
      ("b_1", "blob-0", Some(1L), "u1"),
      ("b_2", "blob-0", Some(2L), ""))
      .toDF("unique_id", "location_key", "location_position", "ordering_key")
    val recs = Seq(
      ("blob-s", 1L, "whole-blob"),
      ("blob-0", 1L, "p1"), ("blob-0", 2L, "p2"))
      .toDF("location_key", "location_position", "payload")
    val out = Replay.positionalJoinWithSingletons(recs, idx, broadcastIndex = true)
      .select("unique_id", "payload").as[(String, String)].collect().toMap
    assert(out === Map("s_1" -> "whole-blob", "b_1" -> "p1", "b_2" -> "p2"))
  }

  test("null position in a multi-record blob is surfaced as unjoinable, not dropped (J3)") {
    val idx = Seq(
      ("amb", "blob-0", None: Option[Long], "u1"),
      ("b_1", "blob-0", Some(1L), "u1"))
      .toDF("unique_id", "location_key", "location_position", "ordering_key")
    val recs = Seq(("blob-0", 1L, "p1"))
      .toDF("location_key", "location_position", "payload")
    val joined = Replay.positionalJoinWithSingletons(recs, idx)
      .select("unique_id").as[String].collect().toSet
    assert(joined === Set("b_1")) // ambiguous row excluded from delivery...
    val dead = Replay.unjoinable(idx).select("unique_id").as[String].collect().toSet
    assert(dead === Set("amb"))   // ...and routed to the error path
  }
}
