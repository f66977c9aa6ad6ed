package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with typed metadata, exactly like `Data` rides
  * through the reference as Avro `bytes`
  * (persistor/internal/common/persistor_record.go:23-32) — the engine never
  * interprets payloads on the persist path, only measures and fingerprints
  * them.
  *
  * Stage inventory (the LLM-training-data surface beyond the reference):
  *   - [[mediaFromDocuments]] — typed media envelope (payload + mime + meta)
  *   - [[withMediaMeta]]      — cheap per-blob measurements (size, magic
  *                              bytes, checksum): narrow, codegen'd, no UDF
  *   - [[frameSample]]        — every k-th fixed-size frame of each payload
  *                              (video frame / audio window sampling shape)
  *   - [[crop]]               — byte-range "resize" (prefix crop)
  *   - [[Decode.features]]    — batched feature extraction; the codec itself
  *                              is a deterministic STUB (no image/audio libs
  *                              in this container) but the Spark plumbing —
  *                              schema, partition parallelism, batch shape —
  *                              is real and tested
  *
  * Scale: every op here is a narrow per-row transformation — no shuffle, no
  * driver traffic; 100 TB of blobs stream through map tasks. Frames explode
  * at most `payload_bytes / frameBytes / stride` rows per input row, all
  * within the same task.
  */
object Multimodal {

  /** The media envelope over the documents table — payload bytes are the
    * UTF-8 encoding of the text (a deterministic stand-in: production data
    * arrives with real binary columns in parquet; nothing downstream
    * assumes the bytes are text). Mime assignment round-robins the three
    * modalities so each gets coverage.
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Per-blob measurements: byte size, leading magic bytes (hex), md5
    * fingerprint. `length` on binary counts bytes; all three are codegen'd
    * built-ins (SURVEY §4: no UDF in the hot path).
    */
  def withMediaMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("magic_hex", hex(substring(col("payload"), 1, 4)))
      .withColumn("checksum", md5(col("payload")))

  /** Sample every `stride`-th frame of `frameBytes` bytes from each payload
    * (video frame-sampling / audio windowing shape). Emits one row per
    * sampled frame: (…, frame_no, frame = binary slice, frame_md5).
    * The slice set is built per-row with `sequence`+`transform` and
    * exploded — no join, no shuffle, bounded fan-out.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("long")
    media
      .withColumn("n_frames", nFrames)
      .withColumn("frame_no",
        // stride rides in the sequence step (no full 0..n-1 scratch array);
        // guard: sequence(0, -1) would count DOWN for an empty payload
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("frame",
        substring_index_bytes(col("payload"), col("frame_no"), frameBytes))
      .withColumn("frame_md5", md5(col("frame")))
  }

  /** Byte-range slice `payload[frameNo*frameBytes, frameBytes)` — `substr`
    * with Column args counts 1-based bytes on BinaryType.
    */
  private def substring_index_bytes(payload: Column, frameNo: Column, frameBytes: Int): Column =
    payload.substr(frameNo * frameBytes + 1, lit(frameBytes))

  /** "Resize" for opaque payloads: crop to the leading `targetBytes` (the
    * byte-level analog of a thumbnail; a real resize lives in [[Decode]]).
    */
  def crop(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload", substring(col("payload"), 1, targetBytes))

  /** Shared-frame near-dup pairs — the media-side dedup step (re-encoded
    * or trimmed copies of a video/audio asset keep most frames
    * bit-identical even when the container checksum differs): pairs of
    * media rows sharing ≥ `minShared` distinct sampled-frame fingerprints.
    * The frame analog of the winnow-overlap text rule, built on
    * [[frameSample]]'s oracle-replayable `frame_md5`.
    *
    * Frames appearing in more than `maxDf` distinct payloads (black
    * frames, silence, padding) are boilerplate AND the skew valve: they
    * are dropped before the pair join, so one white-hot frame yields
    * ≤ maxDf² pairs, never a quadratic blowup. Scale shape: one
    * (doc, frame_md5) distinct, one df aggregation + filter, one
    * fp equi-join, one pair count — no cartesian anywhere.
    */
  def sharedFramePairs(
      media: DataFrame,
      frameBytes: Int,
      stride: Int,
      minShared: Int,
      maxDf: Int): DataFrame = {
    require(minShared >= 1, "minShared must be at least 1")
    require(maxDf >= 2, "maxDf must allow a pair (>= 2)")
    val frames = frameSample(media, frameBytes, stride)
      .select(col("doc_id"), col("frame_md5")).distinct()
    val rare = frames
      .groupBy(col("frame_md5"))
      .agg(countDistinct(col("doc_id")).as("frame_df"))
      .filter(col("frame_df") <= maxDf)
      .select("frame_md5")
    // localCheckpoint, not cache: both sides of the self-join read this
    // table (without a pin the frame explode + distinct + df aggregation
    // run twice), and unlike a CacheManager entry the checkpoint's blocks
    // are released by the context cleaner once the frame is unreachable —
    // repeated bench/verify passes don't accumulate pinned frame tables
    // (the Graph.pagerank release pattern). Bench provenance: pre-round-6
    // samples (~0.6 s at sf0.1) were flattered by that leaked cache
    // (CacheManager matches by canonical plan, so later passes read pass
    // 1's entry); ~1.6 s is the honest per-run cost, not a regression.
    val kept = Pins.pin(frames.join(rare, Seq("frame_md5")))
    kept.as("a")
      .join(kept.as("b"),
        col("a.frame_md5") === col("b.frame_md5") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Integer average-hash (aHash) over the payload bytes — the classic
    * perceptual fingerprint (band mean vs. global mean, the block-mean
    * aHash of the image-dedup literature) computed byte-wise over the
    * opaque payload: bit `b` of `bands` is 1 iff band `b`'s mean byte
    * value is ≥ the payload's global mean. A re-encoded or
    * slightly-corrupted copy perturbs individual bytes but not band
    * means, so its hash lands within a small Hamming radius of the
    * original — the failure mode [[sharedFramePairs]]' bit-exact frame
    * md5s cannot see.
    *
    * All-integer: band sums come from the codegen [[graft.functions.expressions.ByteBandSums]]
    * pass, band populations derive from `n` by the same floor divisions,
    * and the bit decision is the cross-multiplication
    * `sum_b · n ≥ total · cnt_b` — no float mean anywhere, so the DuckDB
    * oracle replays the hash bit-for-bit. An empty band (payload shorter
    * than `bands`) contributes a 0 bit; an empty payload hashes to 0.
    * `bands ≤ 31` keeps the packed mask inside the portable-bitset rule
    * (max 2^31 — DuckDB raises on `1::BIGINT << 63`-class shifts).
    *
    * Exactness bound: the cross-multiplications peak at 255·n²/bands
    * (band sums are ≤ 255·n/bands, multiplied by n), which overflows
    * int64 for payloads past √(2⁶³·bands/255) bytes — ~760 MB at the
    * default 16 bands. Rows past the bound RAISE rather than silently
    * flipping hash bits (a single blob that size belongs in a chunked
    * layout anyway; hash its [[frameSample]] frames instead).
    *
    * Scale shape: one narrow per-row pass — no shuffle, no join.
    */
  def withAHash(media: DataFrame, bands: Int = 16): DataFrame = {
    require(bands >= 1 && bands <= 31, "bands must be in [1, 31]")
    val maxBytes = math.sqrt(Long.MaxValue.toDouble * bands / 255.0).toLong
    val sums = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.ByteBandSums(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("payload")), bands))
    val withSums = media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("bsums", sums)
      .withColumn("btotal", aggregate(col("bsums"), lit(0L), (a, x) => a + x))
    val bits = (0 until bands).map { b =>
      val lo = call_function("div", col("n_bytes") * lit(b.toLong), lit(bands.toLong))
      val hi = call_function("div", col("n_bytes") * lit(b.toLong + 1), lit(bands.toLong))
      val cnt = hi - lo
      when(cnt > 0 &&
          element_at(col("bsums"), b + 1) * col("n_bytes") >= col("btotal") * cnt,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val guarded = when(col("n_bytes") > maxBytes,
      raise_error(concat(lit(s"aHash payload exceeds the int64-exact bound of $maxBytes bytes at $bands bands: "),
        col("n_bytes").cast("string"))).cast("long"))
      .otherwise(bits)
    withSums.withColumn("ahash", guarded).drop("bsums", "btotal")
  }

  /** Perceptual near-duplicate pairs by aHash Hamming distance — the
    * media twin of the text SimHash pass: pairs of payloads whose
    * [[withAHash]] fingerprints differ in ≤ `radius` of `bands` bits.
    * Candidate generation is the standard bit-banding LSH: the hash
    * splits into `groups` contiguous bit groups, and by pigeonhole a
    * pair within radius < groups collides in ≥ 1 group — so candidates
    * come from per-group equality equi-joins (never a cartesian product)
    * with NO false negatives, and every candidate is verified with the
    * exact popcount.
    *
    * Group signatures appearing in more than `maxDf` payloads are
    * dropped before the pair join — boilerplate (uniform-tone media all
    * hash alike) AND the skew valve, exactly [[sharedFramePairs]]'
    * maxDf rule: one white-hot signature yields ≤ maxDf² pairs, never a
    * quadratic blowup. That cut is part of the operator's CONTRACT (a
    * pair is reported iff it verifies AND shares a sub-maxDf group),
    * which the oracle replays verbatim.
    */
  def perceptualHashPairs(
      media: DataFrame,
      bands: Int = 16,
      groups: Int = 4,
      radius: Int = 3,
      maxDf: Int = 8): DataFrame = {
    require(groups >= 1 && bands % groups == 0, "groups must divide bands")
    require(radius >= 0 && radius < groups,
      "radius must be < groups (pigeonhole recall guarantee)")
    require(maxDf >= 2, "maxDf must allow a pair (>= 2)")
    val bpg = bands / groups
    val mask = (1L << bpg) - 1L
    val h = withAHash(media, bands).select(col("doc_id"), col("ahash"))
    val grouped = h.select(col("doc_id"), col("ahash"),
      explode(array((0 until groups).map(g => struct(lit(g).as("grp"),
        shiftright(col("ahash"), g * bpg).bitwiseAND(lit(mask)).as("sig"))): _*))
        .as("gs"))
      .select(col("doc_id"), col("ahash"),
        col("gs.grp").as("grp"), col("gs.sig").as("sig"))
    val rare = grouped
      .groupBy(col("grp"), col("sig"))
      .agg(countDistinct(col("doc_id")).as("gdf"))
      .filter(col("gdf") <= maxDf)
      .select("grp", "sig")
    // pinned: both sides of the candidate self-join read the kept table
    // (a self-join gets zero ReusedExchange — the house rule); released
    // once the radius-verified result is materialized
    val kept = Pins.pin(grouped.join(rare, Seq("grp", "sig")))
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.grp") === col("b.grp") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    val out = Pins.pin(cand
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= radius)
      .select("doc_a", "doc_b", "hamming"))
    Pins.release(kept)
    out
  }

  /** Decoded features per media row. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      width: Int,
      height: Int,
      features: Array[Float])

  /** The decode / feature-extract stage. Real codecs (PNG/WAV/MP4 decode,
    * model-based feature extractors) batch many blobs per call — on
    * accelerators that is the unit of efficiency — so the plumbing here
    * feeds the codec fixed-size batches per partition via
    * `iterator.grouped(batchSize)`: the same batch shape `mapInPandas`/Arrow
    * would deliver, with task-level parallelism across the cluster.
    */
  object Decode {

    /** Batched decode entry point: real schema, real partition parallelism,
      * real batch shape; stub codec.
      */
    def features(media: DataFrame, batchSize: Int = 64): DataFrame = {
      val spark = media.sparkSession
      import spark.implicits._
      media.select(col("doc_id"), col("mime"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions { rows =>
          rows.grouped(batchSize).flatMap(decodeBatch)
        }
        .toDF()
    }

    /** STUB CODEC — deterministic fake standing in for the real batch
      * decoder (image/audio libraries are not available in this container).
      * Swap this function for the real codec call; everything around it
      * (schema, batching, partitioning) stays.
      */
    private def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
      batch.map { case (id, mime, bytes) =>
        val n = bytes.length
        // fake dimensions: derived from payload size, modality-dependent
        val width = if (mime.startsWith("image")) 16 + (n % 64) else 0
        val height = if (mime.startsWith("image")) 16 + (n / 64 % 64) else 0
        // fake features: mean byte value over 8 equal-width byte bands
        val feats = Array.tabulate(8) { band =>
          val lo = band * n / 8
          val hi = math.max((band + 1) * n / 8, lo + 1)
          var s = 0L
          var i = lo
          while (i < hi && i < n) { s += bytes(i) & 0xff; i += 1 }
          (s.toDouble / math.max(hi - lo, 1) / 255.0).toFloat
        }
        MediaFeatures(id, mime, width, height, feats)
      }
  }
}
