package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.IndexModel
import graft.streaming.PersistPipeline._

/** The invariant harness — the Spark port of the reference's in-process
  * pipeline E2E (persistor/internal/persistor/handler_test.go:221-293):
  * random messages through the REAL pipeline (Avro write → topic → strict
  * decode → index/DL), asserting
  *   processed ⇔ (stored ∧ indexed) ∨ dead-lettered,
  * blob-path mask membership, per-blob position permutations, serde
  * fidelity, and streaming (checkpointed foreachBatch) idempotence.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEvents(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("click", "view", "purchase")
    (0 until n).map { i =>
      (i.toLong,
        Timestamp.valueOf(f"2024-02-${rnd.nextInt(3) + 1}%02d ${rnd.nextInt(24)}%02d:30:00"),
        rnd.nextInt(20).toLong,
        types(rnd.nextInt(3)),
        rnd.nextDouble(),
        s"""{"k": ${rnd.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private lazy val events = syntheticEvents(300, seed = 42L).cache()
  private lazy val workDir: String = {
    val wd = tempDir("pipeline")
    persistBatch(events, wd, 0L)
    wd
  }

  test("invariant: every message is stored AND indexed (none dead-lettered on clean input)") {
    val inputIds = events.select(col("event_id").cast("string")).as[String].collect().toSet
    val storedIds = readRecords(spark, workDir).select("id").as[String].collect().toSet
    val indexedIds = spark.read.parquet(s"$workDir/index")
      .select("broker_msg_id").as[String].collect().toSet
    val dl = spark.read.parquet(s"$workDir/dead_letter").count()
    assert(storedIds === inputIds)
    assert(indexedIds === inputIds)
    assert(dl === 0L)
  }

  test("invariant: positions within each blob form a 1..n permutation") {
    val perBlob = readRecords(spark, workDir)
      .groupBy("location_key")
      .agg(collect_list(col("location_position")).as("ps"))
      .as[(String, Seq[Long])].collect()
    assert(perBlob.nonEmpty)
    perBlob.foreach { case (blob, ps) =>
      assert(ps.sorted === (1L to ps.length.toLong), s"blob $blob positions $ps")
    }
  }

  test("invariant: storage-mask partition directories match event times member-by-member") {
    val dirs = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$workDir/records"))
      .filter(_.toString.contains("day="))
      .map[String](_.toString).toArray.map(_.toString)
      .flatMap("year=(\\d+)/month=(\\d+)/day=(\\d+)".r.findFirstMatchIn(_))
      .map(m => (m.group(1), m.group(2), m.group(3))).toSet
    val expected = events
      .select(date_format(col("ts"), "yyyy"), date_format(col("ts"), "MM"),
        date_format(col("ts"), "dd"))
      .distinct().as[(String, String, String)].collect().toSet
    assert(dirs === expected)
  }

  test("Avro OCF round-trip preserves payload bytes and metadata (D1/D2)") {
    val back = readRecords(spark, workDir)
      .select(col("id"), col("data").cast("string").as("payload"),
        element_at(col("metadata"), "broker_id").as("broker_id"))
    val joined = events
      .select(col("event_id").cast("string").as("id"), col("props"),
        concat(lit("t-"), col("event_type")).as("expect_broker"))
      .join(back, "id")
    assert(joined.count() === 300L)
    assert(joined.filter(col("props") =!= col("payload") ||
      col("broker_id") =!= col("expect_broker")).count() === 0L)
  }

  test("pipeline index equals the direct derivation (JSON round-trip is lossless)") {
    val viaPipeline = spark.read.parquet(s"$workDir/index")
      .select(IndexModel.Columns.filterNot(_ == "additional_metadata").map(col): _*)
    val direct = IndexModel.fromEventsFlat(events)
    assert(viaPipeline.exceptAll(direct).count() === 0L)
    assert(direct.exceptAll(viaPipeline).count() === 0L)
  }

  test("strict decode dead-letters malformed JSON, unknown keys, and missing required keys (T7/D4)") {
    val valid = indexerPayload(messagesFromEvents(events.limit(3)))
      .as[String].collect()
    val unknownKey = valid.head.stripSuffix("}") + ""","intruder":"x"}"""
    val missingRequired = valid.head.replaceAll(""""broker_id":"[^"]*",?""", "")
    val topic = (valid.toSeq ++ Seq("{not json", unknownKey, missingRequired)).toDF("value")
    val (good, bad) = validateTopic(topic)
    val badRows = bad.collect()
    assert(good.count() === 3L)
    assert(badRows.length === 3)
    val categories = badRows.map(r => r.getAs[String]("dead_letter_error_category"))
    assert(categories.count(_ == "deserialization_error") === 1)
    assert(categories.count(_ == "validation_error") === 2)
    assert(badRows.forall(_.getAs[String]("dead_letter_error_source") == "indexer"))
    // nothing is both good and dead-lettered; everything is one or the other
    assert(good.count() + bad.count() === topic.count())
  }

  test("formatIndex round-trips micro-precision timestamps and 1-based positions (T8)") {
    val ev = Seq((7L, Timestamp.valueOf("2024-02-01 03:04:05.123456"), 4L,
      "click", 0.5, """{"k": 1}""")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
    val (good, bad) = validateTopic(indexerPayload(messagesFromEvents(ev)).toDF("value"))
    assert(bad.count() === 0)
    val row = formatIndex(good).select("publish_time", "location_position").head()
    assert(row.getTimestamp(0) === Timestamp.valueOf("2024-02-01 03:04:05.123456"))
    assert(row.getLong(1) === 1L)
  }

  test("streaming: maxFilesPerTrigger=1 yields one micro-batch per file (W1)") {
    val stage = tempDir("stage")
    val wd = tempDir("stream")
    syntheticEvents(60, 1L).coalesce(1).write.parquet(s"$stage/f0")
    syntheticEvents(60, 2L).withColumn("event_id", col("event_id") + 1000)
      .coalesce(1).write.parquet(s"$stage/f1")
    syntheticEvents(60, 3L).withColumn("event_id", col("event_id") + 2000)
      .coalesce(1).write.parquet(s"$stage/f2")
    runStream(spark, s"$stage/f*", wd, maxFilesPerTrigger = 1)
    val batches = spark.read.parquet(s"$wd/index")
      .select("batch_id").distinct().count()
    assert(batches === 3L)
    assert(spark.read.parquet(s"$wd/index").count() === 180L)

    // W2: re-running against the same checkpoint reprocesses nothing and
    // the stored output is unchanged (idempotent effect)
    runStream(spark, s"$stage/f*", wd, maxFilesPerTrigger = 1)
    assert(spark.read.parquet(s"$wd/index").count() === 180L)
    assert(readRecords(spark, wd).count() === 180L)
  }

  test("flow control tolerates a poisoned batch under budget and keeps consuming (W4)") {
    val stage = tempDir("fc-stage")
    val wd = tempDir("fc")
    syntheticEvents(30, 6L).coalesce(1).write.parquet(s"$stage/f0")
    syntheticEvents(30, 7L).withColumn("event_id", col("event_id") + 5000)
      .coalesce(1).write.parquet(s"$stage/f1")
    syntheticEvents(30, 8L).withColumn("event_id", col("event_id") + 9000)
      .coalesce(1).write.parquet(s"$stage/f2")
    // poison exactly the middle file's rows: the batch fails at execution
    val poison = (df: DataFrame) => df.withColumn("event_id",
      when(col("event_id").between(5000, 6000),
        raise_error(lit("poisoned batch"))).otherwise(col("event_id")))
    val fc = new graft.operators.FlowControl(maxErrors = 5)
    runStream(spark, s"$stage/f*", wd, maxFilesPerTrigger = 1,
      prepare = poison, flowControl = Some(fc))
    // the two clean batches landed; the poisoned one did not; no crash
    val ids = spark.read.parquet(s"$wd/index")
      .select(col("broker_msg_id").cast("long")).as[Long].collect()
    assert(ids.length === 60)
    assert(!ids.exists(id => id >= 5000 && id <= 6000))
    assert(!fc.shouldStop)

    // over budget: the same failure is fatal (stop-on-error escalation)
    val fcTight = new graft.operators.FlowControl(maxErrors = 1)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(spark, s"$stage/f*", tempDir("fc2"), maxFilesPerTrigger = 1,
        prepare = poison, flowControl = Some(fcTight))
    }
  }

  test("per-batch registry updates ride the streamed pipeline (metrics.go:106-146)") {
    // one registry accumulates across micro-batches, exactly the
    // reference's UpdateSuccessMetrics-per-handled-batch shape
    val reg = new graft.operators.MetricsRegistry("persistor")
    val stage = tempDir("metrics-stage")
    val wd = tempDir("metrics")
    syntheticEvents(40, 10L).coalesce(1).write.parquet(s"$stage/f0")
    syntheticEvents(40, 11L).withColumn("event_id", col("event_id") + 1000)
      .coalesce(1).write.parquet(s"$stage/f1")
    runStream(spark, s"$stage/f*", wd, maxFilesPerTrigger = 1,
      metrics = Some(reg))
    val expectBytes = spark.read.parquet(s"$stage/f0", s"$stage/f1")
      .agg(sum(octet_length(col("props").cast("binary")))).head().getLong(0)
    def sample(text: String, name: String): Double = text.linesIterator
      .find(_.startsWith(name + " ")).get.split(" ").last.toDouble
    val text = reg.prometheusText
    assert(sample(text, "persistor_processed_messages_total") == 80.0)
    assert(sample(text, "persistor_processed_bytes_total") == expectBytes.toDouble)
    assert(sample(text, "persistor_processing_times_milliseconds_count") == 80.0)
    // clean input: the failure families stay zero
    assert(sample(text, "persistor_failed_messages_total") == 0.0)

    // the failure half, unit-driven (persistBatch cannot dead-letter
    // well-formed events — validateTopic is the gate): a nonempty bad
    // frame bumps the failed counters with its byte mass, success untouched
    val bad = Seq(("{not json", "deserialization_error", "x", "indexer"))
      .toDF("value", "dead_letter_error_category", "dead_letter_error_reason",
        "dead_letter_error_source")
    updateRegistry(reg, messagesFromEvents(events.limit(0)), bad)
    val t2 = reg.prometheusText
    assert(sample(t2, "persistor_failed_messages_total") == 1.0)
    assert(sample(t2, "persistor_failed_processed_bytes_total") == 9.0)
    assert(sample(t2, "persistor_processed_messages_total") == 80.0)
  }

  test("graceful drain finishes every buffered micro-batch before stopping (W7)") {
    val stage = tempDir("drain-stage")
    val wd = tempDir("drain")
    syntheticEvents(40, 4L).coalesce(1).write.parquet(s"$stage/f0")
    syntheticEvents(40, 5L).withColumn("event_id", col("event_id") + 1000)
      .coalesce(1).write.parquet(s"$stage/f1")
    val q = runStreamAsync(spark, s"$stage/f*", wd, maxFilesPerTrigger = 1)
    drain(q)
    assert(!q.isActive)
    assert(spark.read.parquet(s"$wd/index").count() === 80L)
  }
}
