package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batch "decode" via mapPartitions.
  *
  * The container has no image/audio libraries, so the decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder]]); everything
  * Spark-side — schema, binary payloads, partition-batched decode,
  * typed output — is real. Swapping in a real decoder is a one-line
  * change of the `MediaDecoder` instance used by [[decodeMeta]].
  */
object Multimodal {

  /** Typed metadata produced by decoding one media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, sha256: String,
                             width: Int, height: Int, n_frames: Int)

  /** Decoder boundary: payload bytes -> decoded metadata fields. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta
  }

  /** Header-sniffing decoder: real container metadata where the bytes
    * carry it, deterministic STUB values otherwise.
    *
    * PNG (IHDR width/height) and JPEG (SOFn frame dimensions) headers
    * are parsed directly — pure JVM byte inspection, no media libraries.
    * Pixel-level decode (the part that genuinely needs a codec) is the
    * clearly-marked stub: for non-image payloads "dimensions" derive
    * deterministically from the byte length, standing in for a real
    * codec call. */
  object StubDecoder extends MediaDecoder {

    private def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
      val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
      if (b.length >= 24 && b.take(4).sameElements(magic)) {
        def be32(o: Int) = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
          ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        Some((be32(16), be32(20))) // IHDR starts at offset 16
      } else None
    }

    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        // ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        // marker — skip them, the marker is the first non-FF byte
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker >= 0xd0 && marker <= 0xd9 || marker == 0x01) {
          i = j + 1 // standalone marker, no length segment
        } else {
          if (j + 2 >= b.length) return None
          val len = ((b(j + 1) & 0xff) << 8) | (b(j + 2) & 0xff)
          // SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC): frame header
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (j + 7 >= b.length) return None
            val h = ((b(j + 4) & 0xff) << 8) | (b(j + 5) & 0xff)
            val w = ((b(j + 6) & 0xff) << 8) | (b(j + 7) & 0xff)
            return Some((w, h))
          }
          i = j + 1 + len
        }
      }
      None
    }

    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val sha = md.digest(payload).map("%02x".format(_)).mkString
      val n = payload.length.toLong
      pngDims(payload).orElse(jpegDims(payload)) match {
        case Some((w, h)) => MediaMeta(docId, n, sha, w, h, n_frames = 1)
        case None => // STUB fallback: no codec in this environment
          MediaMeta(docId, n, sha,
            width = (n % 640).toInt + 1,
            height = (n % 480).toInt + 1,
            n_frames = (n % 30).toInt + 1)
      }
    }
  }

  /** Attach the opaque binary payload column (here: utf-8 of `text`,
    * standing in for real image/audio bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batch decode via mapPartitions: one decoder instance per partition
    * (real codecs are expensive to construct), rows streamed through.
    * This is the Scala analogue of a pandas `mapInPandas` batch UDF. */
  def decodeMeta(spark: SparkSession, payloads: DataFrame,
                 decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // one instance per partition
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }

  /** Resize planning: target dimensions preserving aspect ratio, long
    * side clamped to `maxDim` — pure integer math (floor division) so
    * the oracle matches exactly. Upscaling never happens (scale capped
    * at 1). The pixel resample itself is the decoder's job and stays
    * behind the stub boundary like decode; this computes the plan every
    * batch resizer needs: output dims + whether work is required. */
  def resizeMeta(meta: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, "maxDim must be >= 1")
    val longSide = greatest(col("width"), col("height"))
    val needs = longSide > maxDim
    // floor(side * maxDim / longSide): int math, no doubles anywhere.
    // Short side clamps to >= 1: extreme aspect ratios (1 x 10000 at
    // maxDim 256) would otherwise floor to a 0-dim plan no resizer can
    // execute.
    def scaled(side: Column) =
      when(needs, greatest(
        floor(side.cast("long") * maxDim / longSide).cast("int"), lit(1)))
        .otherwise(side)
    meta.select(col("doc_id"), col("width"), col("height"),
      scaled(col("width")).as("out_width"),
      scaled(col("height")).as("out_height"),
      needs.as("resized"))
  }

  /** Perceptual block-hash over the decoded payload — content-level
    * near-dup for media, the multimodal twin of [[Dedup.simhash]]
    * (which works on word shingles and misses payloads whose DECODED
    * content is near-identical but whose text tokenization differs).
    *
    * This is the classic blockhash pHash structure: split the decoded
    * sample stream into `nBits` contiguous blocks, set bit b iff block
    * b's mean sample is >= the stream's global mean. Near-identical
    * payloads (a few localized edits) perturb few block means, so they
    * land within small hamming distance; [[phashDupPairs]] then reuses
    * the lossless 4x15-bit pigeonhole join.
    *
    * The decode step itself sits behind the same stub boundary as
    * [[decodeMeta]]: with no codec in this environment the "sample
    * stream" is the payload's utf-8 code points (deterministic, so the
    * oracle replays it exactly); a real decoder would substitute pixel
    * luma / PCM samples — the signature math and join are unchanged.
    * Code-point caveat: Spark `ascii()` and DuckDB `unicode()` agree
    * per character (property-tested on accented/CJK BMP text);
    * astral-plane payloads would need a real decoder's byte stream
    * anyway, which is exactly the swap-in point.
    *
    * All comparisons are integer-exact: mean_b >= mean_global iff
    * sum_b * n >= total * count_b (no division, engine-portable). The
    * products run in Decimal(38,0) ([[meanBitTest]]): any product of
    * two int64 values is < 8.6e37, so the comparison CANNOT overflow —
    * a plain long product would have corrupted signatures silently
    * from ~2M-char CJK payloads (2^14.3-ish mean · n² crosses 2^63
    * near n ≈ 21M; worst-case 2^21 code points already at n ≈ 2M).
    * The only residual bound is the int64 block SUM itself:
    * Σ samples · 2^21 < 2^63 needs ~4e12 samples per doc — no real
    * payload gets there (DuckDB's sum() widens to int128, so the
    * oracle agrees everywhere the Spark side is defined).
    *
    * Scale shape: one explode (Σ samples rows), one (doc_id, blk)
    * aggregate with map-side combine, a ≤nBits-rows-per-doc window,
    * one doc-keyed aggregate. Linear, no pair term; empty payloads get
    * signature 0 via the left join. */
  /** The block-mean-vs-global-mean bit test of [[blockHash]], exact
    * for ANY int64 inputs: sum_b/count_b >= total/n cross-multiplied,
    * with both products in Decimal(38,0). Two 20-digit operands yield
    * a 38-digit product slot and |int64 · int64| < 8.6e37 < 1e38, so
    * no value can overflow the slot — the long-product formulation
    * silently wrapped (and corrupted signatures) once sum_b · n
    * crossed 2^63, reachable at ~2M chars of CJK payload. */
  private[graft] def meanBitTest(sb: Column, n: Column, total: Column,
                                 cb: Column): Column =
    sb.cast("decimal(20,0)") * n.cast("decimal(20,0)") >=
      total.cast("decimal(20,0)") * cb.cast("decimal(20,0)")

  def blockHash(payloads: DataFrame, nBits: Int = 60): DataFrame = {
    require(nBits >= 1 && nBits <= 60, s"nBits must be in [1, 60], got $nBits")
    val px = payloads
      .select(col("doc_id"), col("payload").cast("string").as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), length(col("t")).cast("long").as("n"),
        posexplode(split(col("t"), "")))
      .toDF("doc_id", "n", "pos", "c")
      // Java's split("") keeps a trailing zero-width match under
      // Spark's limit=-1; the filter drops it portably (no real
      // per-char element is ever the empty string)
      .filter(col("c") =!= "")
      .select(col("doc_id"), col("n"), col("pos").cast("long").as("pos"),
        ascii(col("c")).cast("long").as("p"))
    val blocks = px
      .groupBy(col("doc_id"),
        floor(col("pos") * nBits / col("n")).cast("int").as("blk"))
      .agg(sum(col("p")).as("sb"), count(lit(1)).as("cb"),
        max(col("n")).as("n"))
    // per-doc global total via a window: safe here because a doc has
    // at most nBits block rows — never a skewed partition
    val wnd = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val sigs = blocks
      .withColumn("total", sum(col("sb")).over(wnd))
      .groupBy("doc_id")
      .agg(sum(when(meanBitTest(col("sb"), col("n"), col("total"), col("cb")),
        expr("shiftleft(CAST(1 AS BIGINT), blk)")).otherwise(0L))
        .as("phash"))
    payloads.select(col("doc_id"))
      .join(sigs, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("phash"), lit(0L)).as("phash"))
  }

  /** Content-level near-dup pairs over decoded payloads: [[blockHash]]
    * signatures through the pigeonhole hamming join
    * ([[Dedup.hammingBlockPairs]] — the same lossless 4x15-bit block
    * scheme as text SimHash). Output (doc_a, doc_b, hamming),
    * hamming <= maxHamming <= 3. */
  def phashDupPairs(payloads: DataFrame, maxHamming: Int): DataFrame =
    Dedup.hammingBlockPairs(blockHash(payloads), "phash", maxHamming)

  /** Frame sampling: one output row per kept frame, every `stride`-th
    * frame from 0, capped at `maxFrames` per doc (uniform head-sample
    * of the decoded metadata — the actual pixel fetch would be the
    * decoder's seek, stubbed here like decode itself). Declarative
    * (sequence + explode): the fan-out runs inside codegen and
    * partition sizing survives the row multiplication because
    * maxFrames bounds it. */
  def sampleFrames(meta: DataFrame, stride: Int,
                   maxFrames: Int): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames must be >= 1")
    val lastKept = least(
      (col("n_frames") - 1) - pmod(col("n_frames") - 1, lit(stride)),
      lit(stride.toLong * (maxFrames - 1)))
    // frameless media (a real decoder returning n_frames <= 0 for
    // corrupt input) contributes zero rows; without the filter the
    // negative sequence bound aborts the whole job
    meta.filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), lastKept.cast("long"), lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"))
  }
}
