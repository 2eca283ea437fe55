package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: header sniffing on real PNG/JPEG bytes, stub
  * fallback, and the mapPartitions batch path end-to-end. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal valid-enough PNG prefix: magic + IHDR with 320x200. */
  private val png: Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    out ++= Array(0x00, 0x00, 0x00, 0x0d).map(_.toByte) // IHDR length
    out ++= "IHDR".getBytes
    out ++= Array(0, 0, 1, 64).map(_.toByte)  // width 320
    out ++= Array(0, 0, 0, 200).map(_.toByte) // height 200
    out ++= Array.fill(10)(0.toByte)
    out.toArray
  }

  /** JPEG: SOI + APP0 stub + SOF0 with 640x480. */
  private val jpeg: Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= Array(0xff, 0xd8).map(_.toByte)                 // SOI
    out ++= Array(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte) // APP0 len 4
    out ++= Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)       // SOF0 len 17, precision
    out ++= Array(0x01, 0xe0).map(_.toByte)                 // height 480
    out ++= Array(0x02, 0x80).map(_.toByte)                 // width 640
    out ++= Array.fill(12)(0.toByte)
    out.toArray
  }

  test("decoder: PNG/JPEG dimensions parsed from headers, stub for other bytes") {
    val p = Multimodal.StubDecoder.decode(1, png)
    assert(p.width == 320 && p.height == 200 && p.n_frames == 1)
    val j = Multimodal.StubDecoder.decode(2, jpeg)
    assert(j.width == 640 && j.height == 480)
    val t = Multimodal.StubDecoder.decode(3, "plain text".getBytes)
    assert(t.n_bytes == 10 && t.width == (10 % 640) + 1)
    assert(t.sha256.length == 64)
  }

  test("mapPartitions batch decode over a mixed binary column") {
    val df = Seq((1L, png), (2L, jpeg), (3L, "hello".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeMeta(spark, df).collect().sortBy(_.doc_id)
    assert(out.map(m => (m.width, m.height)).toSeq ==
      Seq((320, 200), (640, 480), (6, 6))) // 5 % 640 + 1 = 6
  }

  test("blockHash: hand-computed signature on a tiny payload; empty " +
    "payload gets signature 0") {
    // "ab" with nBits=2: pixels (97, 98), blocks {0:[97], 1:[98]},
    // total=195, n=2. bit0: 97*2 >= 195*1 -> 194 >= 195 false;
    // bit1: 98*2 >= 195*1 -> 196 >= 195 true -> phash = 2
    val df = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.blockHash(Multimodal.withPayload(df), nBits = 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 0L)), s"got $out")
  }

  test("meanBitTest: exact at magnitudes where the int64 product wraps") {
    // sb·n reaches ~2^83 here — a long product silently wraps negative
    // and corrupts the signature; the Decimal(38,0) comparison must
    // agree with BigInt ground truth at every magnitude
    val cases = Seq(
      (1L << 52, 1L << 31, (1L << 52) + 1, 1L << 31),        // just below
      ((1L << 52) + 1, 1L << 31, 1L << 52, 1L << 31),        // just above
      (1L << 52, 1L << 31, 1L << 52, 1L << 31),              // exactly equal
      (Long.MaxValue / 3, Long.MaxValue / 5,
        Long.MaxValue / 4, Long.MaxValue / 6),               // ~2^124 products
      (97L, 2L, 195L, 1L), (98L, 2L, 195L, 1L))              // tiny sanity
    val got = cases.toDF("sb", "n", "total", "cb")
      .select(Multimodal.meanBitTest(col("sb"), col("n"), col("total"),
        col("cb")).as("bit"))
      .as[Boolean].collect().toSeq
    val want = cases.map { case (sb, n, total, cb) =>
      BigInt(sb) * BigInt(n) >= BigInt(total) * BigInt(cb) }
    assert(got == want, s"got $got want $want")
  }

  test("phashDupPairs: near-identical payloads pair within hamming 3, " +
    "unrelated payloads do not; symmetric under the pigeonhole join") {
    val base = (0 until 600).map(i => ('a' + i % 26).toChar).mkString
    val nearDup = base.updated(7, 'z').updated(300, 'q') // two local edits
    val other = (0 until 600).map(i =>
      ('a' + (i * 17 + 5) % 26).toChar).mkString
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashDupPairs(
        Multimodal.withPayload(docs), maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc paired: $pairs")
    // identical payloads: hamming 0, always paired
    val same = Multimodal.phashDupPairs(Multimodal.withPayload(
        Seq((1L, base), (2L, base)).toDF("doc_id", "text")), 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(same == Seq((1L, 2L, 0)), s"got $same")
  }

  test("resizeMeta: extreme aspect ratios clamp the short side to 1, " +
    "never a 0-dim plan") {
    val meta = Seq(
      (1L, 1, 10000),   // floor(1*256/10000)=0 -> clamps to 1
      (2L, 10000, 1),
      (3L, 512, 256),   // ordinary downscale: 256 x 128
      (4L, 100, 100))   // no resize needed
      .toDF("doc_id", "width", "height")
    val out = Multimodal.resizeMeta(meta, maxDim = 256)
      .orderBy("doc_id")
      .select("out_width", "out_height", "resized")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1, 256, true), (256, 1, true), (256, 128, true), (100, 100, false)))
  }
}
