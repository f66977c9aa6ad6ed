package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Broker source surface — the Spark-native form of the reference's batched
  * receivers and iterators (SURVEY §2.1 S1-S3):
  *
  *   - S1 PubSub batched receiver (persistor/internal/persistor/receiver.go:31-58)
  *   - S2 Service Bus iterator→receiver (receiver.go:61-76)
  *   - S3 Kafka batch iterator (iterator.go:33-69)
  *
  * The reference aggregates pulled messages into batches bounded by
  * (BatchSize ∧ BatchMemory ∧ BatchTimeout) — defaults 5000 msgs / 1 MB /
  * 30 s (persistor/config/persistor.toml:80-82). Structured Streaming has
  * the same three knobs spelled differently: rows-per-trigger caps, source
  * byte caps, and the trigger interval. Each [[BrokerSource]] is a pure
  * config → (format, options, trigger) mapping, so the batching contract is
  * unit-testable without a live broker; [[FileSource]] is the locally
  * runnable source (what the persist pipeline's tests drive).
  *
  * Scale note: source options are per-executor-core safe — `readStream`
  * fans partitions out across the cluster (Kafka partitions → Spark tasks),
  * so the same config serves local[32] and a 1000-executor cluster.
  */
object Sources {

  /** Micro-batch bounds (persistor/internal/config/config.go:128-134). */
  final case class BatchSettings(
      batchSize: Long = 5000,
      batchMemoryBytes: Long = 1000000,
      batchTimeoutSec: Long = 30)

  /** Kafka's fetch floor: batch memory is clamped to ≥1024 bytes
    * (persistor/internal/persistor/iterator.go:27-31).
    */
  val KafkaMinBatchMemory = 1024L

  sealed trait BrokerSource {
    def format: String

    /** The reader options this source contributes (pure, testable). */
    def options(settings: BatchSettings): Map[String, String]

    /** W1: the reference's BatchTimeout is the longest a partial batch
      * waits — Spark's processing-time trigger interval.
      */
    def trigger(settings: BatchSettings): Trigger =
      Trigger.ProcessingTime(settings.batchTimeoutSec * 1000L)
  }

  /** S3: Kafka consumer-group iterator. MaxPollRecords→maxOffsetsPerTrigger,
    * MaxBytes→kafka.max.partition.fetch.bytes (≥1024), MaxWait→fetch wait
    * (iterator.go:47-61); optional mTLS materializes as kafka.ssl.* options
    * (persistor/internal/config/config.go:203-235).
    */
  final case class KafkaSource(
      bootstrapServers: String,
      topic: String,
      groupId: String,
      tls: Option[KafkaTls] = None) extends BrokerSource {
    val format = "kafka"
    def options(s: BatchSettings): Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "kafka.group.id" -> groupId,
      "maxOffsetsPerTrigger" -> s.batchSize.toString,
      "kafka.max.partition.fetch.bytes" ->
        math.max(s.batchMemoryBytes, KafkaMinBatchMemory).toString,
      "kafka.fetch.max.wait.ms" -> (s.batchTimeoutSec * 1000L).toString
    ) ++ tls.map(_.options).getOrElse(Map.empty)
  }

  /** mTLS material for S3 (config.go:203-235). */
  final case class KafkaTls(
      truststoreLocation: String,
      keystoreLocation: String,
      keyPassword: String) {
    def options: Map[String, String] = Map(
      "kafka.security.protocol" -> "SSL",
      "kafka.ssl.truststore.location" -> truststoreLocation,
      "kafka.ssl.keystore.location" -> keystoreLocation,
      "kafka.ssl.key.password" -> keyPassword)
  }

  /** S1: PubSub subscription config. The reference raises
    * MaxOutstandingMessages/Bytes to at least the batch bounds
    * (receiver.go:37-44) — mirrored here so the connector never starves a
    * batch. (The PubSub Spark connector is not on this classpath; the
    * option mapping is the contract.)
    */
  final case class PubSubSource(projectId: String, subscriptionId: String)
      extends BrokerSource {
    val format = "pubsub"
    def options(s: BatchSettings): Map[String, String] = Map(
      "projectId" -> projectId,
      "subscriptionId" -> subscriptionId,
      "maxMessagesPerPoll" -> s.batchSize.toString,
      "maxOutstandingMessages" -> math.max(s.batchSize, 1000L).toString,
      "maxOutstandingBytes" -> math.max(s.batchMemoryBytes, 1000000L).toString)
  }

  /** S2: Service Bus subscription config (receiver.go:61-76). */
  final case class ServiceBusSource(
      connectionString: String, topic: String, subscription: String)
      extends BrokerSource {
    val format = "servicebus"
    def options(s: BatchSettings): Map[String, String] = Map(
      "connectionString" -> connectionString,
      "topic" -> topic,
      "subscription" -> subscription,
      "maxBatchSize" -> s.batchSize.toString)
  }

  /** The locally runnable source: a file-arrival stream over a directory.
    * The file source's backpressure valves (W8) are mutually exclusive in
    * Spark: a file-count cap (BatchSize analog) OR a byte cap (BatchMemory
    * analog, from settings) — a trigger admits at most that many
    * files/bytes, so a backlog drains in bounded micro-batches instead of
    * one giant one.
    */
  final case class FileSource(
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = Some(1)) extends BrokerSource {
    val format = "parquet"
    def options(s: BatchSettings): Map[String, String] =
      Map("path" -> path) ++ (maxFilesPerTrigger match {
        case Some(n) => Map("maxFilesPerTrigger" -> n.toString)
        case None => Map("maxBytesPerTrigger" -> s.batchMemoryBytes.toString)
      })
  }

  /** Build the streaming reader for a source. */
  def readStream(
      spark: SparkSession,
      source: BrokerSource,
      settings: BatchSettings = BatchSettings()): DataFrame = {
    val reader = spark.readStream.format(source.format)
      .options(source.options(settings))
    source match {
      case f: FileSource => reader.schema(f.schema).load() // path rides in options
      case _ => reader.load()
    }
  }
}

/** Blob location addressing — S4/S5 fetch-path resolution and the T6
  * complete-path builder:
  *
  *   - S4 GCS: `gs://bucket/object`
  *     (resubmitter-api/lib/fetcher/gs/gs.go:54-90)
  *   - S5 ABS: `https://account.blob.core.windows.net/container/blob`
  *     (resubmitter-api/lib/fetcher/abs/abs.go:38,96-112)
  *   - T6 GetCompletePath (persistor/internal/persistor/storage.go:253-264)
  *
  * The reference hand-splits these URLs and issues SDK reads; Spark's
  * filesystem layer resolves `gs://` natively and Azure blobs via the
  * `wasbs://container@account.blob.core.windows.net/path` scheme, so
  * "fetch" is just `spark.read.format("avro").load(paths*)` — the whole
  * goroutine-per-blob fetch stage (resubmitter_job.go:293-331) becomes a
  * single distributed scan. Parsing exists in two forms: JVM-side (for
  * path lists handed to `load`) and Column-side (so location keys resolve
  * inside the plan, codegen'd, no UDF).
  */
object Locations {

  final case class BlobLocation(scheme: String, bucket: String, objectPath: String) {
    /** The Spark-readable path for this location. */
    def sparkPath: String = scheme match {
      case "gs" => s"gs://$bucket/$objectPath"
      case "abs" => // bucket here is "account/container"
        val Array(account, container) = bucket.split("/", 2)
        s"wasbs://$container@$account.blob.core.windows.net/$objectPath"
      case other => s"$other://$bucket/$objectPath"
    }
  }

  private val AbsUrl =
    """https://([^.]+)\.blob\.core\.windows\.net/([^/]+)/(.+)""".r
  private val GenericUrl = """([a-z0-9+.-]+)://([^/]+)/(.+)""".r

  /** Parse a stored location key (gs.go:60-77, abs.go:96-112). */
  def parse(locationKey: String): BlobLocation = locationKey match {
    case AbsUrl(account, container, blob) =>
      BlobLocation("abs", s"$account/$container", blob)
    case GenericUrl(scheme, bucket, path) => BlobLocation(scheme, bucket, path)
    case other =>
      throw new IllegalArgumentException(s"unparseable location key: $other")
  }

  /** Column-side parse: (scheme, bucket, object_path, spark_path) resolved
    * inside the plan so a replay can derive readable paths for millions of
    * location keys without driver round-trips.
    */
  def parsed(locationKey: Column): Column = {
    val isAbs = locationKey.rlike("""^https://[^.]+\.blob\.core\.windows\.net/""")
    val absAccount = regexp_extract(locationKey, """^https://([^.]+)\.blob""", 1)
    val absContainer =
      regexp_extract(locationKey, """windows\.net/([^/]+)/""", 1)
    val absBlob = regexp_extract(locationKey, """windows\.net/[^/]+/(.+)$""", 1)
    val scheme = regexp_extract(locationKey, """^([a-z0-9+.-]+)://""", 1)
    val bucket = regexp_extract(locationKey, """^[a-z0-9+.-]+://([^/]+)/""", 1)
    val path = regexp_extract(locationKey, """^[a-z0-9+.-]+://[^/]+/(.+)$""", 1)
    struct(
      when(isAbs, lit("abs")).otherwise(scheme).as("scheme"),
      when(isAbs, concat(absAccount, lit("/"), absContainer))
        .otherwise(bucket).as("bucket"),
      when(isAbs, absBlob).otherwise(path).as("object_path"),
      when(isAbs,
        concat(lit("wasbs://"), absContainer, lit("@"), absAccount,
          lit(".blob.core.windows.net/"), absBlob))
        .otherwise(locationKey).as("spark_path"))
  }

  /** T6: the complete addressable path for a written blob
    * (storage.go:253-264) — gs:// for GCS, the https form for ABS.
    */
  def completePath(storageType: String, bucket: String, objectName: String): String =
    storageType match {
      case "gcs" => s"gs://$bucket/$objectName"
      case "abs" =>
        val Array(account, container) = bucket.split("/", 2)
        s"https://$account.blob.core.windows.net/$container/$objectName"
      case other =>
        throw new IllegalArgumentException(s"unknown storage type: $other")
    }
}

/** K9 broker sender factory (persistor/internal/sender/initialization.go:35-91)
  * + the replay publishers' sink shapes (K6 kafka.go:204-229,
  * K7 pubsub.go:146-176, K8 servicebus.go:35-82).
  *
  * A sink is (format, options, tolerance): the reference marks the Kafka
  * dead-letter publisher non-tolerable — a DL publish failure is fatal
  * (initialization.go:56-76) — while PubSub/SB DL failures are tolerated
  * and counted. [[Sinks.kafkaFrame]] is the K6 projection: Kafka's sink
  * contract is a DataFrame with `key`/`value` binary columns, key =
  * ordering key so Kafka's per-partition order implements W6.
  */
object Sinks {

  /** Escape a value interpolated into a JAAS config line: backslashes and
    * double quotes would otherwise break the quoting (or, crafted, inject
    * extra login-module options — classic config injection).
    */
  private[sources] def jaasQuote(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  final case class SinkSpec(
      format: String,
      options: Map[String, String],
      /** false ⇒ a publish failure stops the pipeline (non-tolerable). */
      tolerateErrors: Boolean)

  /** Publisher-side PLAIN SASL material (kafka.go:121-145: enabled ⇒ both
    * SASL_USERNAME and SASL_PASSWORD must be present). Rides TLS by
    * default (SASL_SSL); `tls = false` gives SASL_PLAINTEXT.
    */
  final case class KafkaSaslPlain(
      username: String, password: String, tls: Boolean = true) {
    def options: Map[String, String] = Map(
      "kafka.security.protocol" -> (if (tls) "SASL_SSL" else "SASL_PLAINTEXT"),
      "kafka.sasl.mechanism" -> "PLAIN",
      "kafka.sasl.jaas.config" ->
        ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
          s"username=${Sinks.jaasQuote(username)} " +
          s"password=${Sinks.jaasQuote(password)};"))
  }

  /** Publisher-side Kerberos material (kerberos.go:27-60: all five fields
    * required). The producer options carry GSSAPI + the keytab login
    * module; `configPath` (krb5.conf) is JVM-global in Kafka clients —
    * surfaced as [[jvmProperties]] for the launcher
    * (-Djava.security.krb5.conf), not a per-source option.
    */
  final case class KafkaKerberos(
      configPath: String,
      keyTabPath: String,
      realm: String,
      service: String,
      username: String) {
    def options: Map[String, String] = Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "GSSAPI",
      "kafka.sasl.kerberos.service.name" -> service,
      "kafka.sasl.jaas.config" ->
        ("com.sun.security.auth.module.Krb5LoginModule required " +
          "useKeyTab=true storeKey=true " +
          s"keyTab=${Sinks.jaasQuote(keyTabPath)} " +
          s"principal=${Sinks.jaasQuote(s"$username@$realm")};"))
    def jvmProperties: Map[String, String] =
      Map("java.security.krb5.conf" -> configPath)
  }

  /** K9: select the publish sink for a broker type. The kafka branch
    * mirrors the reference producer's security surface (kafka.go:70-202):
    * optional PLAIN SASL (`saslUsername`/`saslPassword` — one without the
    * other is the reference's EnvVariableNotDefined error), optional
    * Kerberos (all five `kerberos*` keys or error), `skipVerify` →
    * disabled endpoint identification, `disableCompression` →
    * compression.type=none.
    */
  def senderFor(
      brokerType: String,
      conf: Map[String, String],
      deadLetter: Boolean = false): SinkSpec = brokerType match {
    case "kafka" =>
      val sasl = (conf.get("saslUsername"), conf.get("saslPassword")) match {
        case (Some(u), Some(p)) => KafkaSaslPlain(u, p).options
        case (None, None)       => Map.empty[String, String]
        case _ => throw new IllegalArgumentException(
          "PLAIN SASL needs both saslUsername and saslPassword")
      }
      val krbKeys = Seq("kerberosConfigPath", "kerberosKeyTabPath",
        "kerberosRealm", "kerberosService", "kerberosUsername")
      val krbPresent = krbKeys.filter(conf.contains)
      val kerberos =
        if (krbPresent.isEmpty) Map.empty[String, String]
        else if (krbPresent.size < krbKeys.size)
          throw new IllegalArgumentException(
            s"Kerberos needs ${krbKeys.mkString(", ")}; missing " +
              krbKeys.diff(krbPresent).mkString(", "))
        else KafkaKerberos(
          conf("kerberosConfigPath"), conf("kerberosKeyTabPath"),
          conf("kerberosRealm"), conf("kerberosService"),
          conf("kerberosUsername")).options
      if (sasl.nonEmpty && kerberos.nonEmpty)
        throw new IllegalArgumentException(
          "PLAIN SASL and Kerberos are mutually exclusive — both set " +
            "kafka.sasl.mechanism and kafka.sasl.jaas.config")
      val skipVerify =
        if (conf.get("skipVerify").contains("true"))
          // InsecureSkipVerify (kafka.go:93-102) — Kafka spells it as an
          // empty endpoint-identification algorithm
          Map("kafka.ssl.endpoint.identification.algorithm" -> "")
        else Map.empty[String, String]
      val compression =
        if (conf.get("disableCompression").contains("true"))
          Map("kafka.compression.type" -> "none")
        else Map.empty[String, String]
      SinkSpec("kafka",
        Map("kafka.bootstrap.servers" -> conf("bootstrapServers"),
          "topic" -> conf("topic"))
          ++ sasl ++ kerberos ++ skipVerify ++ compression,
        // Kafka DL marked non-tolerable (initialization.go:56-76)
        tolerateErrors = !deadLetter)
    case "pubsub" =>
      SinkSpec("pubsub",
        Map("projectId" -> conf("projectId"), "topicId" -> conf("topic"),
          // K7: ordering-key publish needs message ordering enabled
          "enableMessageOrdering" -> "true"),
        tolerateErrors = true)
    case "servicebus" =>
      SinkSpec("servicebus",
        Map("connectionString" -> conf("connectionString"),
          "topic" -> conf("topic")),
        tolerateErrors = true)
    case "file" =>
      SinkSpec("parquet", Map("path" -> conf("path")), tolerateErrors = true)
    case other =>
      throw new IllegalArgumentException(s"unknown broker type: $other")
  }

  /** K6: the Kafka publish projection — key = ordering key (empty key →
    * null, so keyless records round-robin across partitions, exactly the
    * reference's keyless-concurrent semantics), value = payload, headers =
    * the attribute map as Kafka headers.
    */
  def kafkaFrame(df: DataFrame, valueCol: Column): DataFrame =
    df.select(
      when(col("ordering_key") === "", lit(null).cast("binary"))
        .otherwise(col("ordering_key").cast("binary")).as("key"),
      valueCol.cast("binary").as("value"),
      transform(
        map_entries(col("attributes")),
        e => struct(
          e.getField("key").as("key"),
          e.getField("value").cast("binary").as("value"))).as("headers"))
}
