package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators._
import graft.operators.ApiFacade._

/** The complete reference user journey, chained through real artifacts:
  * persist the events (Avro records + index store), query the index
  * through the HTTP-parity facade, replay the returned slice against the
  * written blobs (positional join), repackage and publish in ordering-key
  * order, and read the topic back — every hop consumes the previous hop's
  * actual output, nothing is mocked. A user of the reference switching to
  * this library runs exactly this composition.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def ts(s: String) = Timestamp.valueOf(s)

  test("persist → index → facade range query → replay → ordered publish → read-back") {
    val wd = streaming.PersistPipeline.ensureRun(spark, dir)
    val index = store.IndexStore.materialized(spark, dir)

    // 1. facade range query (GET /range/:coll/t-click) over the real store
    val api = ApiFacade(Map("index" -> QueryService(index)))
    val resp = api.getRange(GetRangeRequest("index", "t-click",
      from = Some("2024-01-01T00:00:00Z"), to = Some("2024-02-01T00:00:00Z"),
      limit = Some("100000")))
    assert(resp.status === 200)
    val slice = resp.data.get
    val nSlice = slice.count()
    assert(nSlice > 0)

    // 2. replay: fetch jobs manifest + positional join against the Avro
    // blobs the pipeline actually wrote
    val jobs = Replay.fetchJobs(slice)
    assert(jobs.count() > 0 && jobs.agg(sum("n_records")).head().getLong(0) === nSlice)
    val records = streaming.PersistPipeline.readRecords(spark, wd)
    val joined = Replay.positionalJoin(records, slice, broadcastIndex = true)
    assert(joined.count() === nSlice) // every queried row finds its record

    // 3. repackage + ordered publish to a file topic, then read it back
    val topicDir = java.nio.file.Files.createTempDirectory("graft-e2e-topic").toString
    Publisher.publishOrdered(joined, topicDir) // publishOrdered repackages internally
    val topic = Publisher.readTopic(spark, topicDir)
    assert(topic.count() === nSlice)

    // keyed messages carry a dense per-key 1..n publish sequence; keyless
    // messages carry none (reference: fully parallel)
    val keyedSeqs = topic.filter(col("ordering_key") =!= "")
      .groupBy("ordering_key")
      .agg(count(lit(1)).as("n"), min("publish_seq").as("mn"),
        max("publish_seq").as("mx"), countDistinct("publish_seq").as("d"))
      .filter(!(col("mn") === 1 && col("mx") === col("n") && col("d") === col("n")))
    assert(keyedSeqs.isEmpty, "keyed publish sequences must be dense 1..n")
    assert(topic.filter(col("ordering_key") === "" && col("publish_seq").isNotNull).isEmpty)

    // 4. the republished attribute maps round-trip the business keys
    val attrs = topic.select(from_json(col("value"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")).as("m"))
    assert(attrs.filter(!col("m").getItem("business_object_key").isNotNull).isEmpty)
  }

  test("facade point lookup agrees with the replayed record payload") {
    val wd = streaming.PersistPipeline.ensureRun(spark, dir)
    val index = store.IndexStore.materialized(spark, dir)
    val api = ApiFacade(Map("index" -> QueryService(index)))
    val someId = index.agg(min("unique_id")).head().getString(0)
    val resp = api.getUnique(GetUniqueRequest("index", someId))
    assert(resp.status === 200)
    val row = resp.data.get.select("location_key", "location_position").head()
    val rec = streaming.PersistPipeline.readRecords(spark, wd)
      .filter(col("location_key") === row.getString(0) &&
        col("location_position") === row.getLong(1))
    assert(rec.count() === 1) // the indexed location resolves to exactly one record
  }
}
