package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Config loading + validation against the reference's semantics
  * (config/validation.go:28-71, writer_validation.go:27-48,
  * config/vars.go env-name contract, persistor.toml/indexer.toml shapes).
  */
class ConfigSpec extends AnyFunSuite {

  /** A persistor.toml-shaped document (the shipped file's structure with
    * the blanks filled the way a real deployment would).
    */
  private val persistorToml =
    """# deployment config
      |IndexerEnabled = true
      |DeadLetterEnabled = true
      |Reader.Type = "kafka"
      |Sender.Type = "kafka"
      |Sender.TopicID = "idx-topic"
      |Sender.DeadLetterTopic = "dl-topic"
      |
      |[Reader.Kafka]
      |Address = "broker:9092"
      |GroupID = "persistor"
      |TopicID = "events"
      |
      |[Reader.Kafka.TLS]
      |Enabled = false
      |CertFile = "/path/to/cert.pem"
      |KeyFile = "/path/to/key.pem"
      |CAFile = "/path/to/ca.pem"
      |
      |[Storage]
      |Type = "gcs"
      |Prefix = "msg"
      |MsgExtension = "avro"
      |Mask = "year/month/day/hour"
      |CustomValues = ""
      |Destination = "my-bucket"
      |TopicID = "events"
      |
      |[Sender.Kafka]
      |Address = "broker:9092"
      |
      |[BatchSettings] # batch settings for receiver
      |BatchSize = 5000
      |BatchTimeout = "30s"
      |BatchMemory = 1_000_000
      |""".stripMargin

  test("persistor.toml-shaped input maps to the typed config") {
    val c = Config.loadPersistor(persistorToml).toOption.get
    assert(c.reader.tpe == "kafka")
    assert(c.reader.kafkaAddress == "broker:9092")
    assert(c.reader.kafkaGroupId == "persistor")
    assert(c.indexerEnabled && c.deadLetterEnabled)
    assert(c.sender.topicId == "idx-topic")
    assert(c.storage.destination == "my-bucket")
    assert(c.batch == Sources.BatchSettings(5000L, 1000000L, 30L))
    // the bridge into the streaming-source surface
    assert(c.reader.toSource ==
      Sources.KafkaSource("broker:9092", "events", "persistor"))
    val (_, errs, warns) = Config.validatePersistor(c)
    assert(errs.isEmpty, errs)
    assert(warns.isEmpty, warns)
  }

  test("env overrides win over file values (fig.UseEnv name contract)") {
    assert(Config.envName("reader.kafka.address") == "READER_KAFKA_ADDRESS")
    val c = Config.loadPersistor(persistorToml, env = Map(
      "READER_KAFKA_ADDRESS" -> "other:9092",
      "BATCHSETTINGS_BATCHSIZE" -> "100",
      "BATCHSETTINGS_BATCHTIMEOUT" -> "1m30s",
      "DEADLETTERENABLED" -> "true")).toOption.get
    assert(c.reader.kafkaAddress == "other:9092")
    assert(c.batch.batchSize == 100L)
    assert(c.batch.batchTimeoutSec == 90L)
    // a BARE-integer duration override parses as seconds, matching the
    // file spelling — env and file forms of one value never diverge
    val bare = Config.loadPersistor(persistorToml,
      env = Map("BATCHSETTINGS_BATCHTIMEOUT" -> "45")).toOption.get
    assert(bare.batch.batchTimeoutSec == 45L)
  }

  test("unsupported lines and bad coercions fail loudly, not silently") {
    assert(Config.parseToml("Reader.Type = [1, 2]").isLeft)
    assert(Config.parseToml("just some words").isLeft)
    val bad = Config.loadPersistor(persistorToml,
      env = Map("BATCHSETTINGS_BATCHSIZE" -> "lots"))
    assert(bad.isLeft)
    assert(bad.left.toOption.get.exists(_.contains("expected an integer")))
  }

  test("go-duration parsing covers the units the reference accepts") {
    assert(Config.parseGoDurationSec("30s").contains(30L))
    assert(Config.parseGoDurationSec("1m30s").contains(90L))
    assert(Config.parseGoDurationSec("2h").contains(7200L))
    assert(Config.parseGoDurationSec("500ms").contains(0L)) // floor to sec
    assert(Config.parseGoDurationSec("30 seconds").isEmpty)
    assert(Config.parseGoDurationSec("").isEmpty)
  }

  // -------------------------------------------------- reader/sender rules

  test("reader validation: per-type required fields (validation.go:103-151)") {
    def errsFor(patch: Map[String, String]) = {
      val c = Config.loadPersistor(persistorToml, env = patch).toOption.get
      Config.validatePersistor(c)._2
    }
    assert(errsFor(Map("READER_KAFKA_ADDRESS" -> "")) // empty override
      .contains("Address must not be empty."))
    assert(errsFor(Map("READER_TYPE" -> ""))
      .contains("BrokerType must not be empty."))
    assert(errsFor(Map("READER_TYPE" -> "rabbitmq"))
      .contains("Reader type rabbitmq is not recognized"))
    assert(errsFor(Map("READER_TYPE" -> "pubsub"))
      .toSet == Set("SubID must not be empty.", "ProjectID must not be empty."))
    assert(errsFor(Map("READER_TYPE" -> "servicebus")).toSet ==
      Set("ConnectionString must not be empty.", "TopicID must not be empty.",
        "SubID must not be empty."))
  }

  test("TLS enabled requires all three PEM files (NewTLSConfig rule)") {
    val c = Config.loadPersistor(persistorToml, env = Map(
      "READER_KAFKA_TLS_ENABLED" -> "true",
      "READER_KAFKA_TLS_CAFILE" -> "")).toOption.get
    assert(Config.validatePersistor(c)._2
      .contains("clientCertFile, clientKeyFile, and caCertFile cannot be empty"))
    // enabled with all files present contributes the PEM-typed options
    val ok = Config.TlsFiles(enabled = true, "c.pem", "k.pem", "ca.pem")
    assert(ok.options("kafka.ssl.truststore.location") == "ca.pem")
    assert(Config.TlsFiles(enabled = false, "", "", "").options.isEmpty)
  }

  // -------------------------------------------------- cross-field rules

  test("indexer enabled: sender topic required and distinct from source topic") {
    def errsFor(patch: Map[String, String]) =
      Config.validatePersistor(
        Config.loadPersistor(persistorToml, env = patch).toOption.get)._2
    assert(errsFor(Map("SENDER_TOPICID" -> ""))
      .contains("Indexer is enabled but SENDER_TOPICID is missing"))
    assert(errsFor(Map("SENDER_TOPICID" -> "events"))
      .contains("Source and indexer topic id cannot be the same"))
    assert(errsFor(Map("SENDER_TOPICID" -> "dl-topic"))
      .contains("Dead letter and indexer topic id cannot be the same"))
  }

  test("dead-letter rules: kafka requires DL; disabled DL clears the topic with a warning") {
    val noDl = Config.loadPersistor(persistorToml,
      env = Map("DEADLETTERENABLED" -> "false")).toOption.get
    val (_, errs, _) = Config.validatePersistor(noDl)
    assert(errs.contains("Dead letter must exist if kafka is used"))
    // non-kafka reader: disabled DL + set topic → warn and CLEAR the field
    val pubsub = Config.loadPersistor(persistorToml, env = Map(
      "DEADLETTERENABLED" -> "false", "READER_TYPE" -> "pubsub",
      "READER_PUBSUB_PROJECTID" -> "p", "READER_PUBSUB_SUBID" -> "s")).toOption.get
    val (norm, errs2, warns2) = Config.validatePersistor(pubsub)
    assert(!errs2.exists(_.contains("Dead letter")))
    assert(warns2.contains("Dead lettering is not enabled. Ignoring dead letter topic ID."))
    assert(norm.sender.deadLetterTopic == "")
    // DL enabled but topic missing
    val missing = Config.loadPersistor(persistorToml,
      env = Map("SENDER_DEADLETTERTOPIC" -> "")).toOption.get
    assert(Config.validatePersistor(missing)._2
      .contains("Dead letter topic is enabled but SENDER_DEADLETTERTOPIC is missing"))
  }

  test("env booleans bind Go strconv.ParseBool's token set, exactly (vars.go → fig)") {
    def enabled(v: String): Option[Boolean] =
      Config.loadPersistor(persistorToml, env = Map("INDEXERENABLED" -> v))
        .toOption.map(_.indexerEnabled)
    // the deployment-style spellings the reference's ParseBool accepts
    Seq("1", "t", "T", "TRUE", "true", "True").foreach(v =>
      assert(enabled(v).contains(true), s"`$v` should bind true"))
    Seq("0", "f", "F", "FALSE", "false", "False").foreach(v =>
      assert(enabled(v).contains(false), s"`$v` should bind false"))
    // …and only that set: Go rejects mixed case / yes-no too
    Seq("tRuE", "yes", "no", "2", "").foreach(v =>
      assert(enabled(v).isEmpty, s"`$v` should be rejected"))
  }

  test("indexer disabled clears a stray sender topic with a warning") {
    val c = Config.loadPersistor(persistorToml,
      env = Map("INDEXERENABLED" -> "false")).toOption.get
    val (norm, errs, warns) = Config.validatePersistor(c)
    assert(errs.isEmpty, errs)
    assert(warns.contains("Indexer topic is not enabled. Ignoring Indexer topic ID."))
    assert(norm.sender.topicId == "")
  }

  test("batch bounds (validation.go:155-167)") {
    val c = Config.loadPersistor(persistorToml, env = Map(
      "BATCHSETTINGS_BATCHSIZE" -> "0",
      "BATCHSETTINGS_BATCHTIMEOUT" -> "0s",
      "BATCHSETTINGS_BATCHMEMORY" -> "0")).toOption.get
    val errs = Config.validatePersistor(c)._2
    assert(errs.contains("Batch size must be 1 or greater"))
    assert(errs.contains("Batch timeout must be positive"))
    assert(errs.contains("Batch memory must be 1 or greater"))
  }

  // -------------------------------------------------- storage + mask

  test("storage rules: destination short-circuit, type whitelist, abs account") {
    def errsFor(patch: Map[String, String]) =
      Config.validatePersistor(
        Config.loadPersistor(persistorToml, env = patch).toOption.get)._2
    // empty destination returns EARLY — no type error reported (the
    // reference's early return at writer_validation.go:29-32)
    val e = errsFor(Map("STORAGE_DESTINATION" -> "", "STORAGE_TYPE" -> ""))
    assert(e.contains("Storage.Destination must not be empty."))
    assert(!e.exists(_.contains("STORAGE_TYPE")))
    assert(errsFor(Map("STORAGE_TYPE" -> ""))
      .contains("STORAGE_TYPE must not be empty."))
    assert(errsFor(Map("STORAGE_TYPE" -> "s3"))
      .contains("Storage type s3 not recognized"))
    assert(errsFor(Map("STORAGE_TYPE" -> "abs"))
      .contains("StorageAccountID must not be empty."))
    assert(errsFor(Map("STORAGE_TYPE" -> "abs",
      "STORAGE_STORAGEACCOUNTID" -> "acct")).isEmpty)
  }

  test("mask validity (storage.go:125-165,192-232)") {
    assert(Config.maskErrors("year/month/day/hour", "").isEmpty)
    assert(Config.maskErrors("", "").isEmpty) // empty mask → default layout
    assert(Config.maskErrors("year/{schema_version}/day", "").isEmpty)
    // custom values admit extra members, case-insensitively
    assert(Config.maskErrors("year/Region/day", "region:eu").isEmpty)
    // empty member (double slash / trailing slash)
    assert(Config.maskErrors("year//day", "").exists(_.contains("empty member")))
    // {} with no key
    assert(Config.maskErrors("year/{}/day", "")
      .exists(_.contains("empty attribute key")))
    // unknown member, with the misspelled-braces hint
    val hinted = Config.maskErrors("year/{oops/day", "")
    assert(hinted.exists(_.contains("Did you mean to apply versioning")))
    assert(Config.maskErrors("year/series/day", "")
      .exists(_.contains("not a time part")))
    // malformed custom values string
    assert(Config.maskErrors("year", "k1=v1")
      .exists(_.contains("Format of custom values")))
  }

  // -------------------------------------------------- indexer config

  private val indexerToml =
    """Reader.Type="pubsub"
      |DeadLetterEnabled = true
      |Sender.Type = "pubsub"
      |Sender.DeadLetterTopic = "dl"
      |
      |[Reader.PubSub]
      |ProjectID = "proj"
      |SubID = "sub"
      |
      |[Mongo]
      |ConnectionString      ="mongodb://db:27017"
      |Database              ="persistor"
      |Collection            ="index"
      |Username              =""
      |Password              =""
      |SessionTokenName      =""
      |SessionTokenVal       =""
      |
      |[BatchSettings]
      |BatchSize = 5000
      |BatchTimeout = "30s"
      |BatchMemory = 1_000_000
      |
      |[Sender.PubSub]
      |ProjectID = "proj"
      |""".stripMargin

  test("indexer.toml-shaped input: mongo rules and sender-topic clearing") {
    val c = Config.loadIndexer(indexerToml).toOption.get
    assert(c.mongo.database == "persistor")
    val (_, errs, warns) = Config.validateIndexer(c)
    assert(errs.isEmpty, errs)
    assert(warns.isEmpty, warns)
    // a stray sender topic is cleared with a warning (validation.go:79-83)
    val stray = Config.loadIndexer(indexerToml,
      env = Map("SENDER_TOPICID" -> "t")).toOption.get
    val (norm, _, w) = Config.validateIndexer(stray)
    assert(w.contains("Ignoring Sender.TopicID in Indexer config"))
    assert(norm.sender.topicId == "")
    // mongo cross-field rules
    def mongoErrs(patch: Map[String, String]) =
      Config.validateIndexer(
        Config.loadIndexer(indexerToml, env = patch).toOption.get)._2
    assert(mongoErrs(Map("MONGO_PASSWORD" -> "pw"))
      .contains("set password without username"))
    assert(mongoErrs(Map("MONGO_SESSIONTOKENNAME" -> "tok"))
      .contains("attempted to set session token, but missing either the token name or token value"))
    assert(mongoErrs(Map("MONGO_CONNECTIONSTRING" -> ""))
      .contains("Mongo.ConnectionString must not be empty."))
    // kafka reader without DL is fatal for the indexer too
    assert(Config.validateIndexer(
      Config.loadIndexer(indexerToml, env = Map(
        "READER_TYPE" -> "kafka", "READER_KAFKA_ADDRESS" -> "b:9092",
        "READER_KAFKA_TOPICID" -> "t", "DEADLETTERENABLED" -> "false"))
        .toOption.get)._2
      .contains("Dead letter must exist if kafka is used"))
  }

  test("service-bus connection strings never reach the log summary") {
    val c = Config.loadPersistor(persistorToml, env = Map(
      "READER_TYPE" -> "servicebus",
      "READER_SERVICEBUS_CONNECTIONSTRING" -> "Endpoint=sb://secret",
      "READER_SERVICEBUS_TOPICID" -> "t",
      "READER_SERVICEBUS_SUBID" -> "s")).toOption.get
    val summary = Config.redactedSummary(c)
    assert(summary("Reader.ServiceBus.ConnectionString") == "[redacted]")
    assert(!summary.values.exists(_.contains("secret")))
  }
}
