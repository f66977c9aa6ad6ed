package graft.sources

/** Config loading + validation as a FILE format — the last §7.1-step-1
  * surface: the reference boots from a TOML file with environment-variable
  * overrides and an errorList-style cross-field validation pass before any
  * pipeline starts
  * (persistor/internal/persistor/run.go:34-52 `fig.Load(..., fig.File(...),
  * fig.UseEnv(""))`; persistor/internal/config/config.go:56-63 struct
  * shapes; config/validation.go:28-71 persistor rules,
  * validation.go:74-101 indexer rules, writer_validation.go:27-48 storage
  * rules; config/persistor.toml + indexer.toml shipped defaults).
  *
  * Zero-dependency by design (no TOML library resolves in this build): the
  * parser covers exactly the subset the shipped config files use —
  * `[Table.Sub]` headers, dotted keys (`Reader.Type = ""`), quoted
  * strings, booleans, integers with `_` separators, Go-style duration
  * strings ("30s"), comments — and rejects anything outside it loudly.
  *
  * Environment override mirrors fig's UseEnv("") contract
  * (config/vars.go:17-20: "string value must follow the field structure in
  * config … values set from environment will override the corresponding
  * fields from the toml file"): the env name for field path `Reader.Kafka.
  * Address` is `READER_KAFKA_ADDRESS`. The env map is injectable so the
  * spec exercises overrides without mutating the JVM environment.
  *
  * Validation is the reference's accumulate-don't-throw shape: `validate`
  * returns (normalizedConfig, errors, warnings). Errors match
  * validation.go's strings; the reference's log.Warn-and-clear branches
  * (ignored dead-letter topic, ignored indexer topic) become warnings plus
  * the SAME field clearing, so downstream code sees the normalized config
  * the reference's pipeline would. The reference's live-cloud checks
  * (bucket exists, ABS container reachable — writer_validation.go:51-104)
  * have no sandbox-side analog and are documented as deployment-time.
  */
object Config {

  // ------------------------------------------------------------- values

  sealed trait TomlValue { def render: String }
  final case class TStr(v: String) extends TomlValue { def render: String = v }
  final case class TLong(v: Long) extends TomlValue { def render: String = v.toString }
  final case class TBool(v: Boolean) extends TomlValue { def render: String = v.toString }

  /** Parsed document: lowercased dotted key path → value. Keys are
    * case-insensitive like fig's field matching (persistor.toml spells
    * `Reader.Type`, vars.go spells `READER_TYPE`).
    */
  final case class TomlDoc(values: Map[String, TomlValue]) {
    def get(path: String): Option[TomlValue] = values.get(path.toLowerCase)
  }

  /** Parse the TOML subset. Fails loudly (Left) on lines outside it —
    * a config typo must not silently become a default. One deliberate
    * divergence from full TOML: a key assigned twice takes the LAST
    * value instead of erroring (the same most-specific-wins direction as
    * the env override layer above it); full TOML rejects duplicates.
    */
  def parseToml(text: String): Either[String, TomlDoc] = {
    val out = Map.newBuilder[String, TomlValue]
    var table = ""
    val lines = text.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      i += 1
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          if (name.isEmpty) return Left(s"line $i: empty table header")
          table = name.toLowerCase
        } else {
          val eq = line.indexOf('=')
          if (eq < 1) return Left(s"line $i: expected `key = value`: $line")
          val key = line.substring(0, eq).trim.toLowerCase
          if (key.isEmpty || key.exists(c => c.isWhitespace))
            return Left(s"line $i: bad key: $line")
          parseValue(line.substring(eq + 1).trim) match {
            case Some(v) =>
              out += (if (table.isEmpty) key else s"$table.$key") -> v
            case None => return Left(s"line $i: unsupported value: $line")
          }
        }
      }
    }
    Right(TomlDoc(out.result()))
  }

  /** Strip a trailing `#` comment, respecting double-quoted strings. */
  private def stripComment(line: String): String = {
    var inStr = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inStr = !inStr
      else if (c == '#' && !inStr) return line.substring(0, i)
      i += 1
    }
    line
  }

  private val IntRe = """-?[0-9][0-9_]*""".r

  // Go strconv.ParseBool's exact accept sets (strconv/atob.go)
  private val ParseBoolTrue = Set("1", "t", "T", "TRUE", "true", "True")
  private val ParseBoolFalse = Set("0", "f", "F", "FALSE", "false", "False")
  private def parseValue(s: String): Option[TomlValue] = s match {
    case "" => None
    case _ if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      Some(TStr(s.substring(1, s.length - 1)))
    case "true" => Some(TBool(true))
    case "false" => Some(TBool(false))
    case IntRe() => Some(TLong(s.replace("_", "").toLong))
    case _ => None
  }

  /** fig.UseEnv("") env name for a dotted path: segments joined by `_`,
    * uppercased (config/vars.go — READER_KAFKA_ADDRESS etc.).
    */
  def envName(path: String): String = path.replace(".", "_").toUpperCase

  /** Typed field reads with env override and error accumulation. */
  final class Fields(doc: TomlDoc, env: Map[String, String]) {
    val errors = List.newBuilder[String]

    private def raw(path: String): Option[TomlValue] =
      env.get(envName(path)).map(TStr(_)).orElse(doc.get(path))

    def str(path: String, default: String = ""): String = raw(path) match {
      case Some(v) => v.render
      case None => default
    }
    /** String forms (env overrides) accept exactly Go strconv.ParseBool's
      * token set — the reference's fig loader parses env booleans with it
      * (config/vars.go), so a deployment-style `INDEXERENABLED=1` must
      * bind. Go's set is "1 t T TRUE true True / 0 f F FALSE false
      * False" — note NOT arbitrary-case ("tRuE" is rejected there too).
      */
    def bool(path: String, default: Boolean = false): Boolean = raw(path) match {
      case Some(TBool(b)) => b
      case Some(TStr(s)) if ParseBoolTrue(s) => true
      case Some(TStr(s)) if ParseBoolFalse(s) => false
      case Some(other) =>
        errors += s"$path: expected a boolean, got `${other.render}`"; default
      case None => default
    }
    def long(path: String, default: Long): Long = raw(path) match {
      case Some(TLong(n)) => n
      case Some(TStr(s)) if IntRe.matches(s.trim) => s.trim.replace("_", "").toLong
      case Some(other) =>
        errors += s"$path: expected an integer, got `${other.render}`"; default
      case None => default
    }
    /** Go-duration ("30s", "1m30s", "500ms") or bare integer seconds —
      * accepted in BOTH value forms (a bare `30` in the file parses as
      * TLong; the same override arriving via env is a string), so file
      * and env spellings of one value never diverge.
      */
    def durationSec(path: String, default: Long): Long = raw(path) match {
      case Some(TLong(n)) => n
      case Some(TStr(s)) if IntRe.matches(s.trim) =>
        s.trim.replace("_", "").toLong
      case Some(TStr(s)) => parseGoDurationSec(s) match {
        case Some(sec) => sec
        case None => errors += s"$path: unparseable duration `$s`"; default
      }
      case Some(other) =>
        errors += s"$path: unparseable duration `${other.render}`"; default
      case None => default
    }
  }

  /** Go time.ParseDuration subset → whole seconds (floor). Units
    * ns/us/ms/s/m/h, concatenated terms allowed.
    */
  def parseGoDurationSec(s: String): Option[Long] = {
    val term = """([0-9]+)(ns|us|ms|s|m|h)""".r
    val whole = s"""(?:${term.regex})+""".r
    if (!whole.matches(s.trim)) None
    else {
      val nanos = term.findAllMatchIn(s.trim).map { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "ns" => n
          case "us" => n * 1000L
          case "ms" => n * 1000000L
          case "s" => n * 1000000000L
          case "m" => n * 60L * 1000000000L
          case "h" => n * 3600L * 1000000000L
        }
      }.sum
      Some(nanos / 1000000000L)
    }
  }

  // ------------------------------------------------------------- shapes

  /** Reader.Kafka.TLS / Sender.Kafka.TLS (config.go:120-125). Enabled ⇒
    * all three PEM paths present (config.go `NewTLSConfig`:
    * ErrEmptyCertFiles). The reference loads CertFile+KeyFile as an X509
    * pair and CAFile into the root pool; the Kafka-client analog is
    * PEM-typed stores (truststore ← CAFile; keystore ← the cert+key PEM
    * material the deployment combines, same pairing requirement).
    */
  final case class TlsFiles(
      enabled: Boolean, certFile: String, keyFile: String, caFile: String) {
    def options: Map[String, String] =
      if (!enabled) Map.empty
      else Map(
        "kafka.security.protocol" -> "SSL",
        "kafka.ssl.truststore.type" -> "PEM",
        "kafka.ssl.truststore.location" -> caFile,
        "kafka.ssl.keystore.type" -> "PEM",
        "kafka.ssl.keystore.location" -> certFile)
  }

  /** ReaderConfig (config.go:64-69 + per-broker shapes :102-118). */
  final case class ReaderConf(
      tpe: String,
      pubsubProjectId: String, pubsubSubId: String,
      sbConnectionString: String, sbTopicId: String, sbSubId: String,
      kafkaAddress: String, kafkaGroupId: String, kafkaTopicId: String,
      kafkaTls: TlsFiles) {

    /** Bridge to the streaming-source surface (Sources.scala). Only valid
      * after [[validate]] reports no reader errors.
      */
    def toSource: Sources.BrokerSource = tpe match {
      case "kafka" => Sources.KafkaSource(kafkaAddress, kafkaTopicId, kafkaGroupId)
      case "pubsub" => Sources.PubSubSource(pubsubProjectId, pubsubSubId)
      case "servicebus" =>
        Sources.ServiceBusSource(sbConnectionString, sbTopicId, sbSubId)
      case other => throw new IllegalArgumentException(s"Reader type $other")
    }
  }

  /** SenderConfig (config.go:71-77). */
  final case class SenderConf(
      tpe: String,
      topicId: String,
      deadLetterTopic: String,
      pubsubProjectId: String,
      sbConnectionString: String,
      kafkaAddress: String,
      kafkaTls: TlsFiles)

  /** StorageConfig (config.go:38-48). */
  final case class StorageConf(
      tpe: String, prefix: String, msgExtension: String, mask: String,
      customValues: String, destination: String, storageAccountId: String,
      topicId: String)

  /** MongoConfig surface the indexer validates (validation.go:200-226);
    * carried as opaque connection material here (the graft index store is
    * parquet — SURVEY §2.2 K3).
    */
  final case class MongoConf(
      connectionString: String, database: String, collection: String,
      username: String, password: String,
      sessionTokenName: String, sessionTokenVal: String)

  /** PersistorConfig (config.go:56-63). */
  final case class PersistorConf(
      reader: ReaderConf,
      storage: StorageConf,
      indexerEnabled: Boolean,
      deadLetterEnabled: Boolean,
      sender: SenderConf,
      batch: Sources.BatchSettings)

  /** IndexerConfig (config.go:79-85). */
  final case class IndexerConf(
      reader: ReaderConf,
      mongo: MongoConf,
      deadLetterEnabled: Boolean,
      sender: SenderConf,
      batch: Sources.BatchSettings)

  // ------------------------------------------------------------- loading

  private def readTls(f: Fields, base: String): TlsFiles = TlsFiles(
    f.bool(s"$base.enabled"),
    f.str(s"$base.certfile"), f.str(s"$base.keyfile"), f.str(s"$base.cafile"))

  private def readReader(f: Fields): ReaderConf = ReaderConf(
    f.str("reader.type"),
    f.str("reader.pubsub.projectid"), f.str("reader.pubsub.subid"),
    f.str("reader.servicebus.connectionstring"),
    f.str("reader.servicebus.topicid"), f.str("reader.servicebus.subid"),
    f.str("reader.kafka.address"), f.str("reader.kafka.groupid"),
    f.str("reader.kafka.topicid"), readTls(f, "reader.kafka.tls"))

  private def readSender(f: Fields): SenderConf = SenderConf(
    f.str("sender.type"), f.str("sender.topicid"),
    f.str("sender.deadlettertopic"), f.str("sender.pubsub.projectid"),
    f.str("sender.servicebus.connectionstring"),
    f.str("sender.kafka.address"), readTls(f, "sender.kafka.tls"))

  private def readBatch(f: Fields): Sources.BatchSettings = Sources.BatchSettings(
    batchSize = f.long("batchsettings.batchsize", 5000L),
    batchMemoryBytes = f.long("batchsettings.batchmemory", 1000000L),
    batchTimeoutSec = f.durationSec("batchsettings.batchtimeout", 30L))

  /** Load a persistor.toml-shaped document with env overrides. Left =
    * parse/coercion errors (the reference exits before validation on
    * these, run.go:38-44).
    */
  def loadPersistor(
      toml: String,
      env: Map[String, String] = Map.empty): Either[List[String], PersistorConf] =
    parseToml(toml) match {
      case Left(e) => Left(List(e))
      case Right(doc) =>
        val f = new Fields(doc, env)
        val conf = PersistorConf(
          readReader(f),
          StorageConf(
            f.str("storage.type"), f.str("storage.prefix"),
            f.str("storage.msgextension"), f.str("storage.mask"),
            f.str("storage.customvalues"), f.str("storage.destination"),
            f.str("storage.storageaccountid"), f.str("storage.topicid")),
          f.bool("indexerenabled"), f.bool("deadletterenabled"),
          readSender(f), readBatch(f))
        val errs = f.errors.result()
        if (errs.nonEmpty) Left(errs) else Right(conf)
    }

  /** Load an indexer.toml-shaped document with env overrides. */
  def loadIndexer(
      toml: String,
      env: Map[String, String] = Map.empty): Either[List[String], IndexerConf] =
    parseToml(toml) match {
      case Left(e) => Left(List(e))
      case Right(doc) =>
        val f = new Fields(doc, env)
        val conf = IndexerConf(
          readReader(f),
          MongoConf(
            f.str("mongo.connectionstring"), f.str("mongo.database"),
            f.str("mongo.collection"), f.str("mongo.username"),
            f.str("mongo.password"), f.str("mongo.sessiontokenname"),
            f.str("mongo.sessiontokenval")),
          f.bool("deadletterenabled"), readSender(f), readBatch(f))
        val errs = f.errors.result()
        if (errs.nonEmpty) Left(errs) else Right(conf)
    }

  // ---------------------------------------------------------- validation

  private def emptyErr(field: String) = s"$field must not be empty."

  /** Reader rules (validation.go:103-151). */
  private def readerErrors(r: ReaderConf): List[String] = {
    val b = List.newBuilder[String]
    r.tpe match {
      case "kafka" =>
        if (r.kafkaAddress.isEmpty) b += emptyErr("Address")
        if (r.kafkaTopicId.isEmpty) b += emptyErr("TopicID")
      case "pubsub" =>
        if (r.pubsubSubId.isEmpty) b += emptyErr("SubID")
        if (r.pubsubProjectId.isEmpty) b += emptyErr("ProjectID")
      case "servicebus" =>
        if (r.sbConnectionString.isEmpty) b += emptyErr("ConnectionString")
        if (r.sbTopicId.isEmpty) b += emptyErr("TopicID")
        if (r.sbSubId.isEmpty) b += emptyErr("SubID")
      case "" => b += emptyErr("BrokerType")
      case other => b += s"Reader type $other is not recognized"
    }
    b ++= tlsErrors(r.kafkaTls)
    b.result()
  }

  /** NewTLSConfig's enabled-⇒-all-files rule (config.go:172-185). */
  private def tlsErrors(t: TlsFiles): List[String] =
    if (t.enabled && (t.certFile.isEmpty || t.keyFile.isEmpty || t.caFile.isEmpty))
      List("clientCertFile, clientKeyFile, and caCertFile cannot be empty")
    else Nil

  /** Sender rules (validation.go:169-198). */
  private def senderErrors(s: SenderConf): List[String] = {
    val b = List.newBuilder[String]
    s.tpe match {
      case "kafka" =>
        if (s.kafkaAddress.isEmpty) b += emptyErr("Sender.Address")
      case "pubsub" =>
        if (s.pubsubProjectId.isEmpty) b += emptyErr("Sender.ProjectID")
      case "servicebus" =>
        if (s.sbConnectionString.isEmpty) b += emptyErr("Sender.ConnectionString")
      case "" => b += emptyErr("Type")
      case other => b += s"Sender type $other is not recognized"
    }
    b ++= tlsErrors(s.kafkaTls)
    b.result()
  }

  /** Storage rules (writer_validation.go:27-48). The bucket/container
    * EXISTENCE probes (:51-104) are live-cloud calls with no sandbox
    * analog — deployment-time checks, not modeled. Mask/custom-values
    * validity (storage.go:125-165,192-232) IS config-shaped and checked
    * here: the reference only discovers a bad mask when the writer boots.
    */
  private def storageErrors(st: StorageConf): List[String] = {
    val b = List.newBuilder[String]
    if (st.destination.isEmpty) {
      b += emptyErr("Storage.Destination")
      return b.result() // the reference returns early here (:29-32)
    }
    st.tpe match {
      case "gcs" => ()
      case "abs" =>
        if (st.storageAccountId.isEmpty) b += emptyErr("StorageAccountID")
      case "" => b += emptyErr("STORAGE_TYPE")
      case other => b += s"Storage type $other not recognized"
    }
    b ++= maskErrors(st.mask, st.customValues)
    b.result()
  }

  /** Mask member + custom-values rules (storage.go:125-165 split/brace
    * parse; :192-232 member whitelist against the custom-values map;
    * ValidateCustomValues's `key1:value1,key2:value2` format).
    */
  def maskErrors(mask: String, customValues: String): List[String] = {
    if (mask.isEmpty) return Nil // empty mask → default layout (storage.go:114-120)
    val b = List.newBuilder[String]
    val customKeys: Set[String] = customValues.trim match {
      case "" => Set.empty
      case cv =>
        val pairs = cv.split(",", -1).map(_.trim)
        if (pairs.exists(p => p.split(":", -1).length != 2 ||
            p.split(":", -1).exists(_.trim.isEmpty))) {
          b += "reading custom values. Format of custom values should be -> key1:value1,key2:value2 "
          Set.empty
        } else pairs.map(_.split(":", 2)(0).trim.toLowerCase).toSet
    }
    val members = mask.split("/", -1)
    members.zipWithIndex.foreach { case (m, pos) =>
      if (m.isEmpty)
        b += s"mask `$mask` has an empty member at position ${pos + 1}"
      else if (m.startsWith("{") && m.endsWith("}")) {
        if (m.length < 3) // `{}` — no attribute key (MinMaskAttributeKeyLen)
          b += s"mask `$mask` has an empty attribute key at position ${pos + 1}"
      } else {
        val lower = m.toLowerCase
        if (!Set("year", "month", "day", "hour")(lower) && !customKeys(lower)) {
          val hint =
            if (m.contains("{") || m.contains("}"))
              ". Value contains } or { characters. Did you mean to apply versioning in a {myattributekey} format?"
            else ""
          b += s"storage config: mask member `$m` is not a time part, a custom value, or an attribute key$hint"
        }
      }
    }
    b.result()
  }

  /** Batch bounds (validation.go:155-167). */
  private def batchErrors(s: Sources.BatchSettings): List[String] = {
    val b = List.newBuilder[String]
    if (s.batchSize < 1) b += "Batch size must be 1 or greater"
    if (s.batchTimeoutSec < 1) b += "Batch timeout must be positive"
    if (s.batchMemoryBytes < 1) b += "Batch memory must be 1 or greater"
    b.result()
  }

  /** Mongo rules (validation.go:200-226). */
  private def mongoErrors(m: MongoConf): List[String] = {
    val b = List.newBuilder[String]
    if (m.connectionString.isEmpty) b += emptyErr("Mongo.ConnectionString")
    if (m.database.isEmpty) b += emptyErr("Mongo.Database")
    if (m.collection.isEmpty) b += emptyErr("Mongo.Collection")
    if (m.password.nonEmpty && m.username.isEmpty) b += "set password without username"
    if ((m.sessionTokenName.nonEmpty && m.sessionTokenVal.isEmpty) ||
        (m.sessionTokenName.isEmpty && m.sessionTokenVal.nonEmpty))
      b += "attempted to set session token, but missing either the token name or token value"
    b.result()
  }

  /** The persistor cross-field pass (validation.go:28-71): returns the
    * NORMALIZED config (the reference's warn-and-clear branches applied),
    * the error list, and the warning list.
    */
  def validatePersistor(c: PersistorConf): (PersistorConf, List[String], List[String]) = {
    val errs = List.newBuilder[String]
    val warns = List.newBuilder[String]
    var conf = c
    errs ++= readerErrors(c.reader)
    errs ++= storageErrors(c.storage)
    if (c.indexerEnabled) {
      errs ++= senderErrors(c.sender)
      if (c.storage.topicId == c.sender.topicId)
        errs += "Source and indexer topic id cannot be the same"
      if (c.sender.topicId.isEmpty)
        errs += "Indexer is enabled but SENDER_TOPICID is missing"
    }
    if (c.deadLetterEnabled) {
      if (c.sender.deadLetterTopic.isEmpty)
        errs += "Dead letter topic is enabled but SENDER_DEADLETTERTOPIC is missing"
      else if (c.indexerEnabled && c.sender.topicId == c.sender.deadLetterTopic)
        errs += "Dead letter and indexer topic id cannot be the same"
    } else {
      if (c.reader.tpe == "kafka")
        errs += "Dead letter must exist if kafka is used"
      else if (c.sender.deadLetterTopic.nonEmpty) {
        warns += "Dead lettering is not enabled. Ignoring dead letter topic ID."
        conf = conf.copy(sender = conf.sender.copy(deadLetterTopic = ""))
      }
    }
    if (!c.indexerEnabled && c.sender.topicId.nonEmpty) {
      warns += "Indexer topic is not enabled. Ignoring Indexer topic ID."
      conf = conf.copy(sender = conf.sender.copy(topicId = ""))
    }
    errs ++= batchErrors(c.batch)
    (conf, errs.result(), warns.result())
  }

  /** The indexer cross-field pass (validation.go:74-101). */
  def validateIndexer(c: IndexerConf): (IndexerConf, List[String], List[String]) = {
    val errs = List.newBuilder[String]
    val warns = List.newBuilder[String]
    var conf = c
    errs ++= readerErrors(c.reader)
    errs ++= mongoErrors(c.mongo)
    if (c.sender.topicId.nonEmpty) {
      warns += "Ignoring Sender.TopicID in Indexer config"
      conf = conf.copy(sender = conf.sender.copy(topicId = ""))
    }
    if (c.reader.tpe == "kafka" && !c.deadLetterEnabled)
      errs += "Dead letter must exist if kafka is used"
    else if (!c.deadLetterEnabled && c.sender.deadLetterTopic.nonEmpty) {
      warns += "Dead lettering is not enabled. Ignoring dead letter topic ID."
      conf = conf.copy(sender = conf.sender.copy(deadLetterTopic = ""))
    }
    if (c.deadLetterEnabled && c.sender.deadLetterTopic.isEmpty)
      errs += "Dead letter topic is enabled but SENDER_DEADLETTERTOPIC is missing"
    errs ++= batchErrors(c.batch)
    (conf, errs.result(), warns.result())
  }

  /** Redacted form for logging (config.go:151-172 hideSensitiveConfigInfo:
    * Service Bus connection strings never reach a log line).
    */
  def redactedSummary(c: PersistorConf): Map[String, String] = {
    def sb(v: String) = if (v.isEmpty) "" else "[redacted]"
    Map(
      "Reader.Type" -> c.reader.tpe,
      "Reader.ServiceBus.ConnectionString" ->
        (if (c.reader.tpe == "servicebus") sb(c.reader.sbConnectionString)
         else c.reader.sbConnectionString),
      "Sender.Type" -> c.sender.tpe,
      "Sender.ServiceBus.ConnectionString" ->
        (if (c.sender.tpe == "servicebus") sb(c.sender.sbConnectionString)
         else c.sender.sbConnectionString),
      "Storage.Type" -> c.storage.tpe,
      "Storage.Destination" -> c.storage.destination,
      "IndexerEnabled" -> c.indexerEnabled.toString,
      "DeadLetterEnabled" -> c.deadLetterEnabled.toString,
      "BatchSettings.BatchSize" -> c.batch.batchSize.toString)
  }
}
