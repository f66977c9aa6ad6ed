package graft.sources

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Source/sink surface tests: batch-settings → reader-option mapping
  * (S1-S3/W1/W8), location-key parsing both JVM- and Column-side (S4/S5/T6),
  * and the sender factory (K9) + Kafka frame projection (K6).
  */
class SourcesSpec extends SparkSpec {
  import Sources._
  import spark.implicits._

  test("Kafka source maps batch bounds to reader options with the 1024-byte floor (S3)") {
    val src = KafkaSource("broker:9092", "events", "g1")
    val opts = src.options(BatchSettings(batchSize = 500, batchMemoryBytes = 10, batchTimeoutSec = 7))
    assert(opts("maxOffsetsPerTrigger") === "500")
    assert(opts("kafka.max.partition.fetch.bytes") === "1024") // clamped up
    assert(opts("kafka.fetch.max.wait.ms") === "7000")
    assert(opts("subscribe") === "events")
    assert(src.trigger(BatchSettings(batchTimeoutSec = 7)) ===
      Trigger.ProcessingTime(7000L))
  }

  test("Kafka mTLS materializes as ssl options (S3)") {
    val src = KafkaSource("b:9092", "t", "g",
      tls = Some(KafkaTls("/ts.jks", "/ks.jks", "pw")))
    val opts = src.options(BatchSettings())
    assert(opts("kafka.security.protocol") === "SSL")
    assert(opts("kafka.ssl.keystore.location") === "/ks.jks")
  }

  test("PubSub source raises outstanding caps to at least the batch bounds (S1)") {
    val opts = PubSubSource("p", "sub").options(
      BatchSettings(batchSize = 9999, batchMemoryBytes = 5))
    assert(opts("maxOutstandingMessages") === "9999")
    assert(opts("maxOutstandingBytes") === "1000000") // floor kept
  }

  test("file source streams with files/bytes-per-trigger backpressure (W8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    spark.range(10).toDF("n").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    // the two valves are mutually exclusive in Spark's file source
    val byBytes = FileSource(s"$dir/in", schema, maxFilesPerTrigger = None)
    assert(byBytes.options(BatchSettings())("maxBytesPerTrigger") === "1000000")
    assert(!byBytes.options(BatchSettings()).contains("maxFilesPerTrigger"))
    val src = FileSource(s"$dir/in", schema, maxFilesPerTrigger = Some(1))
    assert(!src.options(BatchSettings()).contains("maxBytesPerTrigger"))
    val stream = Sources.readStream(spark, src)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("src_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM src_test").head().getLong(0) === 10L)
  }

  test("location keys parse for GCS and ABS, both JVM- and Column-side (S4/S5)") {
    val g = Locations.parse("gs://bucket/a/b/c.avro")
    assert(g === Locations.BlobLocation("gs", "bucket", "a/b/c.avro"))
    assert(g.sparkPath === "gs://bucket/a/b/c.avro")
    val a = Locations.parse("https://acct.blob.core.windows.net/cont/x/y.avro")
    assert(a === Locations.BlobLocation("abs", "acct/cont", "x/y.avro"))
    assert(a.sparkPath === "wasbs://cont@acct.blob.core.windows.net/x/y.avro")
    intercept[IllegalArgumentException](Locations.parse("no-scheme/path"))

    val parsed = Seq("gs://bucket/a/b.avro",
      "https://acct.blob.core.windows.net/cont/x.avro")
      .toDF("lk")
      .select(Locations.parsed(org.apache.spark.sql.functions.col("lk")).as("p"))
      .select("p.scheme", "p.bucket", "p.object_path", "p.spark_path")
      .as[(String, String, String, String)].collect()
    assert(parsed(0) === (("gs", "bucket", "a/b.avro", "gs://bucket/a/b.avro")))
    assert(parsed(1) === (("abs", "acct/cont", "x.avro",
      "wasbs://cont@acct.blob.core.windows.net/x.avro")))
  }

  test("completePath builds the reference's T6 shapes") {
    assert(Locations.completePath("gcs", "b", "o/p") === "gs://b/o/p")
    assert(Locations.completePath("abs", "acct/cont", "o") ===
      "https://acct.blob.core.windows.net/cont/o")
  }

  test("sender factory: kafka dead-letter is non-tolerable (K9)") {
    val dl = Sinks.senderFor("kafka",
      Map("bootstrapServers" -> "b:9092", "topic" -> "dl"), deadLetter = true)
    assert(!dl.tolerateErrors)
    val main = Sinks.senderFor("kafka",
      Map("bootstrapServers" -> "b:9092", "topic" -> "t"))
    assert(main.tolerateErrors)
    assert(Sinks.senderFor("pubsub",
      Map("projectId" -> "p", "topic" -> "t")).options("enableMessageOrdering") === "true")
    intercept[IllegalArgumentException](Sinks.senderFor("smoke-signal", Map.empty))
  }

  test("kafka publisher PLAIN SASL maps to SASL_SSL producer options (K6)") {
    val spec = Sinks.senderFor("kafka", Map(
      "bootstrapServers" -> "b:9092", "topic" -> "t",
      "saslUsername" -> "alice", "saslPassword" -> "s3cret",
      "skipVerify" -> "true", "disableCompression" -> "true"))
    assert(spec.options("kafka.security.protocol") === "SASL_SSL")
    assert(spec.options("kafka.sasl.mechanism") === "PLAIN")
    val jaas = spec.options("kafka.sasl.jaas.config")
    assert(jaas.contains("PlainLoginModule") &&
      jaas.contains("""username="alice"""") && jaas.contains("""password="s3cret""""))
    assert(spec.options("kafka.ssl.endpoint.identification.algorithm") === "")
    assert(spec.options("kafka.compression.type") === "none")
    // username without password is the reference's EnvVariableNotDefined
    intercept[IllegalArgumentException](Sinks.senderFor("kafka", Map(
      "bootstrapServers" -> "b:9092", "topic" -> "t", "saslUsername" -> "alice")))
  }

  test("JAAS values are escaped; SASL+Kerberos together is rejected (K6)") {
    val spec = Sinks.senderFor("kafka", Map(
      "bootstrapServers" -> "b:9092", "topic" -> "t",
      "saslUsername" -> "ali\"ce", "saslPassword" -> """pa\ss""""))
    val jaas = spec.options("kafka.sasl.jaas.config")
    // quotes and backslashes in credentials can't break out of the quoting
    assert(jaas.contains("""username="ali\"ce""""), jaas)
    assert(jaas.contains("""password="pa\\ss\""""), jaas)
    // both auth mechanisms write kafka.sasl.* — ambiguous, must throw
    intercept[IllegalArgumentException](Sinks.senderFor("kafka", Map(
      "bootstrapServers" -> "b:9092", "topic" -> "t",
      "saslUsername" -> "u", "saslPassword" -> "p",
      "kerberosConfigPath" -> "/etc/krb5.conf",
      "kerberosKeyTabPath" -> "/k", "kerberosRealm" -> "R",
      "kerberosService" -> "kafka", "kerberosUsername" -> "svc")))
  }

  test("kafka publisher Kerberos maps to GSSAPI options; partial config errors (K6)") {
    val full = Map(
      "bootstrapServers" -> "b:9092", "topic" -> "t",
      "kerberosConfigPath" -> "/etc/krb5.conf",
      "kerberosKeyTabPath" -> "/keytabs/svc.keytab",
      "kerberosRealm" -> "EXAMPLE.COM",
      "kerberosService" -> "kafka",
      "kerberosUsername" -> "svc-replay")
    val spec = Sinks.senderFor("kafka", full)
    assert(spec.options("kafka.security.protocol") === "SASL_SSL")
    assert(spec.options("kafka.sasl.mechanism") === "GSSAPI")
    assert(spec.options("kafka.sasl.kerberos.service.name") === "kafka")
    val jaas = spec.options("kafka.sasl.jaas.config")
    assert(jaas.contains("Krb5LoginModule") && jaas.contains("useKeyTab=true") &&
      jaas.contains("""keyTab="/keytabs/svc.keytab"""") &&
      jaas.contains("""principal="svc-replay@EXAMPLE.COM""""))
    // krb5.conf is a JVM property, not a per-source option (kerberos.go:28-31)
    assert(Sinks.KafkaKerberos("/etc/krb5.conf", "/k", "R", "s", "u")
      .jvmProperties === Map("java.security.krb5.conf" -> "/etc/krb5.conf"))
    // all five fields or error, like LoadKerberosConfigFromEnv
    intercept[IllegalArgumentException](
      Sinks.senderFor("kafka", full - "kerberosRealm"))
  }

  test("kafkaFrame projects key/value/headers; keyless records get null key (K6/W6)") {
    val df = Seq(
      ("u1", "v1", Map("a" -> "1")),
      ("", "v2", Map("b" -> "2")))
      .toDF("ordering_key", "value_str", "attributes")
    val out = Sinks.kafkaFrame(df, org.apache.spark.sql.functions.col("value_str"))
    assert(out.columns.toSeq === Seq("key", "value", "headers"))
    val rows = out.as[(Array[Byte], Array[Byte], Seq[(String, Array[Byte])])]
      .collect().sortBy(r => new String(r._2))
    assert(new String(rows(0)._1) === "u1")
    assert(rows(1)._1 === null)
    assert(rows(0)._3.map { case (k, v) => (k, new String(v)) } === Seq("a" -> "1"))
  }
}
