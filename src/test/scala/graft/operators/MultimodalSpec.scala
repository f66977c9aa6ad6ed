package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal binary-column tests: metadata measurement, frame sampling
  * (including the ragged last frame and the empty-payload guard), crop, and
  * the batched decode plumbing (schema, determinism, batch shape).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 100, "en", "s", 100L),
    (1L, "hello world", "en", "s", 11L),
    (2L, "xyz", "en", "s", 3L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media envelope carries mime + binary payload") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    val mimes = m.select("doc_id", "mime").as[(Long, String)].collect().toMap
    assert(mimes === Map(0L -> "image/png", 1L -> "audio/wav", 2L -> "video/mp4"))
  }

  test("withMediaMeta measures bytes, magic, checksum without UDFs") {
    val out = Multimodal.withMediaMeta(Multimodal.mediaFromDocuments(docs))
      .select("doc_id", "n_bytes", "magic_hex", "checksum")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(out(1) === ((1L, 11L, "68656C6C", // "hell"
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
  }

  test("frameSample emits every stride-th frame incl. ragged tail") {
    // doc 0: 100 bytes / frame 16 → 7 frames (last is 4 bytes), stride 2 → 0,2,4,6
    val frames = Multimodal.frameSample(
      Multimodal.mediaFromDocuments(docs.filter($"doc_id" === 0)), 16, 2)
      .select("frame_no", "n_frames", "frame")
      .as[(Long, Long, Array[Byte])].collect().sortBy(_._1)
    assert(frames.map(_._1).toSeq === Seq(0L, 2L, 4L, 6L))
    assert(frames.forall(_._2 == 7L))
    assert(frames.take(3).forall(_._3.length == 16))
    assert(frames.last._3.length === 4) // ragged tail frame
  }

  test("frameSample yields no rows for empty payloads (guard)") {
    val empty = Seq((9L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Multimodal.frameSample(
      Multimodal.mediaFromDocuments(empty), 16, 1).count() === 0L)
  }

  test("frame boundaries are BYTE offsets, independent of codepoint width") {
    // "é" is 2 UTF-8 bytes: 4 chars → 5 payload bytes → 2 frames of ≤4 bytes
    val mb = Seq((9L, "éabc", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.frameSample(Multimodal.mediaFromDocuments(mb), 4, 1)
      .select("frame_no", "n_frames", "frame")
      .as[(Long, Long, Array[Byte])].collect().sortBy(_._1)
    assert(frames.map(_._2).toSeq === Seq(2L, 2L))
    assert(frames(0)._3.length === 4) // é(2) + a + b — splits mid-text, by bytes
    assert(frames(1)._3.length === 1)
    // NOTE: the q_media_* DuckDB oracles slice by CHARS and are only
    // equivalent on ASCII corpora (the driver testdata is; verified)
  }

  test("crop truncates payloads to the target byte range") {
    val out = Multimodal.crop(Multimodal.mediaFromDocuments(docs), 5)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    assert(new String(out(1L)) === "hello")
    assert(new String(out(2L)) === "xyz") // shorter than target: unchanged
  }

  test("decode stub: real schema, deterministic output, batched per partition") {
    val m = Multimodal.mediaFromDocuments(docs)
    val out = Multimodal.Decode.features(m, batchSize = 2)
    assert(out.columns.toSeq ===
      Seq("doc_id", "mime", "width", "height", "features"))
    val rows = out.as[(Long, String, Int, Int, Array[Float])].collect().sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.forall(_._5.length == 8))
    // image mime gets fake dimensions; audio/video do not
    assert(rows(0)._3 > 0 && rows(1)._3 === 0)
    // deterministic: run twice, identical
    val again = Multimodal.Decode.features(m, batchSize = 2)
      .as[(Long, String, Int, Int, Array[Float])].collect().sortBy(_._1)
    assert(rows.zip(again).forall { case (a, b) =>
      a._1 == b._1 && a._5.toSeq == b._5.toSeq })
  }

  test("sharedFramePairs pairs media with common frames; boilerplate frames are dropped") {
    // frameBytes=4, stride=1. Docs 10/11 share frames "AAAA" and "BBBB"
    // (2 shared → pair). The "ZZZZ" frame appears in ALL FIVE docs →
    // df > maxDf=4 → never contributes; docs 12/13/14 share ONLY "ZZZZ"
    // and must not pair.
    val media = Seq(
      (10L, "AAAABBBBCCCC"),
      (11L, "AAAABBBBDDDD"),
      (12L, "ZZZZEEEEXXX1"),
      (13L, "ZZZZQQQQX2"), // ragged last frame
      (14L, "ZZZZWWWWX3"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("video/mp4").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
    // ZZZZ is in 3 docs; cap at 2 so it crosses the df valve
    val out = Multimodal.sharedFramePairs(media,
        frameBytes = 4, stride = 1, minShared = 2, maxDf = 2)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq((10L, 11L, 2L)))
  }

  test("withAHash: integer band-mean bits, empty-band/empty-payload edges") {
    def media(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), lit("image/png").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
    // 4 bands over 8 bytes: bands of 2; 'zz' (high) vs 'aa' (low) — the
    // high half's band means clear the global mean, the low half's don't
    val h = Multimodal.withAHash(media(20L -> "zzzzaaaa"), bands = 4)
      .select("doc_id", "ahash").as[(Long, Long)].collect().head._2
    assert(h === 3L) // bits 0,1 (the 'zz' bands) set; little-endian packing
    // ties count as ≥: a uniform payload sets every non-empty bit
    val u = Multimodal.withAHash(media(21L -> "mmmm"), bands = 4)
      .select("ahash").as[Long].collect().head
    assert(u === 15L)
    // payload shorter than bands: trailing empty bands contribute 0 bits
    val s = Multimodal.withAHash(media(22L -> "zm"), bands = 4)
      .select("ahash").as[Long].collect().head
    // n=2: band byte ranges [0,0),[0,1),[1,1),[1,2) → only bands 1 and 3
    // non-empty; 'z' ≥ mean → bit 1; 'm' < mean → bit 3 clear
    assert(s === 2L)
    assert(Multimodal.withAHash(media(23L -> ""), bands = 4)
      .select("ahash").as[Long].collect().head === 0L)
  }

  test("perceptualHashPairs catches a re-encoded copy bit-exact frames miss") {
    // doc 31 is a "re-encoded" copy of 30: every 8-byte block keeps its
    // mean character but individual bytes differ ('ab' ↔ 'ba', 'mn' ↔
    // 'nm'), so NO frame md5 survives — sharedFramePairs is blind — while
    // every band mean is identical, so the aHash matches exactly.
    // doc 32 is unrelated content (alternating high/low bands).
    val base = "abababab" * 4 + "mnmnmnmn" * 4 + "zyzyzyzy" * 4 + "cdcdcdcd" * 4
    val reenc = "babababa" * 4 + "nmnmnmnm" * 4 + "yzyzyzyz" * 4 + "dcdcdcdc" * 4
    val other = ("zzzzzzzz" + "aaaaaaaa") * 8
    val media = Seq(30L -> base, 31L -> reenc, 32L -> other)
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("video/mp4").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
    val frames = Multimodal.sharedFramePairs(media,
      frameBytes = 8, stride = 1, minShared = 1, maxDf = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(frames.isEmpty, "re-encoding must defeat the bit-exact frame pass")
    val pairs = Multimodal.perceptualHashPairs(media,
      bands = 16, groups = 4, radius = 2, maxDf = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((30L, 31L, 0L)),
      "the perceptual pass must pair the re-encoded copy (and only it)")
  }

  test("perceptualHashPairs: maxDf valve drops boilerplate signatures; radius bound enforced") {
    // ten all-identical payloads: every group signature has df=10 > maxDf
    // → no candidate survives the boilerplate cut (contract, and the
    // skew valve that stops a 10²-pair blowup)
    val clones = (0 until 10).map(i => (100L + i, "samecontent" * 4))
    val media = clones.toDF("doc_id", "text")
      .select(col("doc_id"), lit("audio/wav").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
    assert(Multimodal.perceptualHashPairs(media,
      bands = 16, groups = 4, radius = 3, maxDf = 8).count() === 0L)
    // radius ≥ groups would break the pigeonhole recall guarantee
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHashPairs(media, bands = 16, groups = 4, radius = 4)
    }
  }
}
