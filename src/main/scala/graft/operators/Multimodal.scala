package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches on
  * the executors.
  *
  * The DECODE step is REAL: [[decodeImage]] parses genuine PNG IHDR and
  * JPEG SOF0/SOF2 headers byte-by-byte (dimension probing needs no
  * codec library), and [[synthImagePayload]] synthesizes genuine
  * headers as the fixture. Full-pixel decode and the
  * feature-extraction / frame-sampling kernels remain deterministic
  * stubs — the pixel-codec libraries are not in this container — but
  * the Spark-side contract around them is real and tested: schema,
  * batch iteration shape (mapPartitions = one JVM-side batch per
  * partition, the Scala analogue of a pandas-UDF batch), partitioning
  * behavior, and null/empty/malformed payload handling. Swapping a
  * stub for a real codec changes only the function body, nothing in
  * the plan.
  */
object Multimodal {

  /** Media metadata produced by the header decoder. */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      valid: Boolean)

  /** Attach a fake binary payload + media type to the documents fixture
    * (the fixtures carry no real media; UTF-8 text bytes stand in as the
    * opaque payload). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))

  /** Minimal GENUINE PNG: 8-byte signature + IHDR (width/height
    * big-endian, 8-bit truecolor, real CRC32) + IEND. 45 bytes — a
    * header any conformant reader accepts for dimension probing.
    * (PNG spec, RFC 2083 §3: signature, IHDR layout, CRC over
    * type+data.) */
  private[operators] def pngPayload(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"png dims must be positive, got ${w}x$h")
    val out = java.nio.ByteBuffer.allocate(45)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
    val ihdrBytes = ihdr.array()
    def crc(b: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32(); c.update(b); c.getValue.toInt
    }
    out.putInt(13).put(ihdrBytes).putInt(crc(ihdrBytes))
    val iend = "IEND".getBytes("US-ASCII")
    out.putInt(0).put(iend).putInt(crc(iend))
    out.array()
  }

  /** Minimal GENUINE JPEG: SOI + APP0/JFIF + a single-component SOF0
    * frame header carrying the dimensions + EOI. 35 bytes. (JPEG
    * ITU-T T.81 §B.2.2: SOFn payload is precision(1) height(2)
    * width(2) ncomp(1) then per-component bytes.) */
  private[operators] def jpegPayload(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
      s"jpeg dims must be in [1, 65535], got ${w}x$h")
    val out = java.nio.ByteBuffer.allocate(35)
    out.put(0xff.toByte).put(0xd8.toByte)             // SOI
    out.put(0xff.toByte).put(0xe0.toByte)             // APP0
    out.putShort(16.toShort)
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.put(1.toByte).put(1.toByte)                   // version 1.1
    out.put(0.toByte)                                 // units
    out.putShort(1.toShort).putShort(1.toShort)       // density
    out.put(0.toByte).put(0.toByte)                   // thumbnail
    out.put(0xff.toByte).put(0xc0.toByte)             // SOF0
    out.putShort(11.toShort)                          // len: 8 + 3*1 comp
    out.put(8.toByte)                                 // precision
    out.putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte)                                 // 1 component
    out.put(1.toByte).put(0x11.toByte).put(0.toByte)  // id, 1x1, qtable 0
    out.put(0xff.toByte).put(0xd9.toByte)             // EOI
    out.array()
  }

  /** REAL image-header decode — pure byte reads, no codec library:
    *  - PNG: check the 8-byte signature, require the first chunk to be
    *    a 13-byte IHDR, read width/height as the two big-endian ints at
    *    offsets 16/20 (RFC 2083 §3.1).
    *  - JPEG: check SOI, then walk the marker-segment chain; the first
    *    SOF frame header (C0–CF except C4/C8/CC) carries height/width
    *    at payload offsets 1/3 (T.81 §B.2.2) — this finds dimensions in
    *    baseline (SOF0), progressive (SOF2) and every other SOFn
    *    variant, skipping APPn/DQT/DHT segments of any length. A
    *    stream that reaches SOS/EOI or truncates without a SOF is
    *    malformed for dimension purposes.
    * Returns (format, width, height, valid); malformed structures land
    * valid=false with zero dims (format still identified from the
    * magic when present). */
  def decodeImage(bytes: Array[Byte]): (String, Int, Int, Boolean) = {
    def be2(i: Int): Int =
      ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def be4(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes == null || bytes.length < 2) ("unknown", 0, 0, false)
    else if (bytes.length >= 8 &&
        pngSig.indices.forall(i => (bytes(i) & 0xff) == pngSig(i))) {
      if (bytes.length >= 24 && be4(8) == 13L &&
          new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
        val w = be4(16); val h = be4(20)
        if (w >= 1 && h >= 1 && w <= Int.MaxValue && h <= Int.MaxValue)
          ("png", w.toInt, h.toInt, true)
        else ("png", 0, 0, false)
      } else ("png", 0, 0, false)
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      var res: (String, Int, Int, Boolean) = ("jpeg", 0, 0, false)
      var done = false
      while (!done && i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) done = true // desynced stream
        else {
          val marker = bytes(i + 1) & 0xff
          if (marker == 0xd9 || marker == 0xda) done = true // EOI/SOS
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
            i += 2 // standalone markers carry no length
          else if (i + 3 >= bytes.length) done = true
          else {
            val segLen = be2(i + 2)
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              if (i + 8 < bytes.length && segLen >= 7) {
                val h = be2(i + 5); val w = be2(i + 7)
                res = ("jpeg", w, h, w >= 1 && h >= 1)
              }
              done = true
            } else if (segLen < 2) done = true // corrupt length
            else i += 2 + segLen
          }
        }
      }
      res
    } else ("unknown", 0, 0, false)
  }

  /** Synthesize a GENUINE image payload per document — the decode
    * fixture: even doc_id → PNG, odd → JPEG, with dimensions the
    * closed form width = 1 + doc_id mod 1021, height = 1 + 7·doc_id
    * mod 997 (so the DuckDB oracle replays the expected dims from
    * doc_id alone and a header-parse bug hash-mismatches). Every 13th
    * doc gets a deliberately MALFORMED payload (PNG truncated before
    * IHDR / JPEG with no SOF segment) — the valid=false path. */
  def synthImagePayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (1 + id % 1021).toInt
          val h = (1 + (id * 7) % 997).toInt
          val bytes =
            if (id % 13 == 0) {
              if (id % 2 == 0)
                pngPayload(w, h).take(10) // truncated before IHDR
              else {
                val full = jpegPayload(w, h)
                full.take(20) ++ full.takeRight(2) // APP0 then EOI, no SOF
              }
            } else if (id % 2 == 0) pngPayload(w, h)
            else jpegPayload(w, h)
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Audio metadata produced by the WAV header decoder. */
  final case class AudioMeta(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      valid: Boolean)

  /** Minimal GENUINE WAV: RIFF/WAVE header + 16-byte PCM fmt chunk +
    * a data chunk of `nFrames` zeroed frames — 44 + nFrames·blockAlign
    * bytes, a file any conformant reader accepts. (RIFF little-endian
    * chunk layout; PCM fmt fields per the WAVE spec.) */
  private[operators] def wavPayload(sampleRate: Int, channels: Int,
                                    bits: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && bits % 8 == 0 && bits > 0 &&
      nFrames >= 0, s"bad wav params: $sampleRate/$channels/$bits/$nFrames")
    val blockAlign = channels * bits / 8
    val dataLen = nFrames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(36 + dataLen) // riff size = file - 8
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(16)                       // PCM fmt chunk length
    out.putShort(1.toShort)              // audio format: PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign)  // byte rate
    out.putShort(blockAlign.toShort)
    out.putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII"))
    out.putInt(dataLen)
    out.array() // zeroed frames follow the header by allocation
  }

  /** REAL WAV header decode — a RIFF chunk walk, pure byte reads:
    * check "RIFF"/"WAVE", then walk (id, LE32 length) chunks to the
    * PCM "fmt " chunk (sample rate / channels / bits) and the "data"
    * chunk (frame count = data length / block align), skipping
    * LIST/fact/other chunks of any length (word-aligned, as RIFF
    * requires). A stream missing either chunk, truncating mid-chunk,
    * or declaring non-PCM/zero geometry is malformed. Returns
    * (format, sampleRate, channels, bits, nFrames, valid). */
  def decodeAudio(bytes: Array[Byte])
      : (String, Int, Int, Int, Long, Boolean) = {
    val bad = ("unknown", 0, 0, 0, 0L, false)
    def tag(i: Int): String = new String(bytes.slice(i, i + 4), "US-ASCII")
    def le4(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def le2(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    if (bytes == null || bytes.length < 12 || tag(0) != "RIFF" ||
        tag(8) != "WAVE") bad
    else {
      var i = 12
      var rate = 0; var ch = 0; var bits = 0; var fmtSeen = false
      var frames = -1L
      var failed = false
      while (!failed && frames < 0 && i + 8 <= bytes.length) {
        val id = tag(i); val len = le4(i + 4)
        // a declared length past the buffer is corrupt for ANY chunk
        // (and unguarded it could overflow the walk into a loop)
        if (len > bytes.length) failed = true
        else if (id == "fmt ") {
          if (len < 16 || i + 8 + 16 > bytes.length) failed = true
          else {
            val audioFormat = le2(i + 8)
            ch = le2(i + 10); rate = le4(i + 12).toInt
            bits = le2(i + 22)
            fmtSeen = audioFormat == 1 && ch > 0 && rate > 0 && bits > 0
            failed = !fmtSeen
          }
        } else if (id == "data") {
          // data must follow a valid fmt (block align needs geometry)
          if (!fmtSeen) failed = true
          else {
            val blockAlign = ch * bits / 8
            if (blockAlign <= 0 || len % blockAlign != 0 ||
                i + 8 + len > bytes.length) failed = true
            else frames = len / blockAlign
          }
        }
        // RIFF chunks are word-aligned: odd lengths carry a pad byte
        i += 8 + len.toInt + (len.toInt & 1)
      }
      if (failed || frames < 0) ("wav", 0, 0, 0, 0L, false)
      else ("wav", rate, ch, bits, frames, true)
    }
  }

  /** Synthesize a GENUINE WAV payload per document — the audio decode
    * fixture, closed-form from doc_id (sample_rate = 8000 + 100·(id
    * mod 441), channels = 1 + id mod 2, bits = 8·(1 + id mod 3),
    * frames = id mod 50); every 13th doc truncates inside the fmt
    * chunk — the valid=false path. */
  def synthAudioPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val full = wavPayload(
            sampleRate = (8000 + 100 * (id % 441)).toInt,
            channels = (1 + id % 2).toInt,
            bits = (8 * (1 + id % 3)).toInt,
            nFrames = (id % 50).toInt)
          (id, if (id % 13 == 0) full.take(20) else full)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decode WAV metadata in executor-side batches via [[decodeAudio]] —
    * the audio sibling of [[decodeMeta]]. */
  def decodeAudioMeta(withPayload: DataFrame): Dataset[AudioMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, rate, ch, bits, frames, ok) = decodeAudio(bytes)
          AudioMeta(id, fmt,
            if (bytes == null) 0L else bytes.length.toLong,
            rate, ch, bits, frames, valid = ok)
        }
      }
  }

  /** Video metadata produced by the MP4 header decoder. */
  final case class VideoMeta(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      timescale: Int,
      duration: Long,
      duration_ms: Long,
      valid: Boolean)

  /** Minimal GENUINE MP4 (ISO BMFF): an `ftyp` box + a `moov` box
    * containing a version-0 `mvhd` carrying timescale and duration —
    * 16 + 8 + 108 = 132 bytes, the header any conformant reader probes
    * for movie duration. (ISO/IEC 14496-12: box = BE32 size incl.
    * header + 4-char type; mvhd v0 payload = version/flags,
    * creation/modification, timescale BE32, duration BE32, then rate/
    * volume/matrix/next-track.) */
  private[operators] def mp4Payload(timescale: Int,
                                    duration: Long): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && duration <= 0xffffffffL,
      s"bad mp4 params: $timescale/$duration")
    val out = java.nio.ByteBuffer.allocate(132) // BIG_ENDIAN default
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")).putInt(0x200)
    out.putInt(116).put("moov".getBytes("US-ASCII"))
    out.putInt(108).put("mvhd".getBytes("US-ASCII"))
    out.putInt(0)                      // version 0 + flags
    out.putInt(0).putInt(0)            // creation / modification
    out.putInt(timescale)
    out.putInt(duration.toInt)         // ≤ 2^32-1 by the require
    out.putInt(0x00010000)             // rate 1.0
    out.putShort(0x0100.toShort)       // volume 1.0
    // reserved(10) + matrix(36) + pre_defined(24) stay zero; the
    // identity matrix entries are not needed for duration probing,
    // and next_track_id closes the box
    out.position(out.position() + 70)
    out.putInt(1)                      // next_track_id
    out.array()
  }

  /** REAL MP4 header decode — the ISO BMFF box walk, pure byte reads:
    * require an `ftyp` leading box (the MP4 magic), walk top-level
    * boxes to `moov`, walk its children to `mvhd`, and read
    * timescale/duration from the version-0 (BE32) or version-1 (BE64
    * times) layout. 64-bit `largesize` boxes are followed; size-0
    * (to-EOF) boxes terminate the walk at that box. A stream without
    * moov/mvhd, truncating mid-box, declaring a corrupt size, or
    * carrying zero timescale is malformed. Returns (format, timescale,
    * duration, valid). */
  def decodeVideo(bytes: Array[Byte]): (String, Int, Long, Boolean) = {
    val bad = ("unknown", 0, 0L, false)
    def tag(i: Int): String = new String(bytes.slice(i, i + 4), "US-ASCII")
    def be4(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def be8(i: Int): Long = (be4(i) << 32) | be4(i + 4)
    // walk boxes in [from, to); onBox returns Some(result) to stop
    def walk(from: Int, to: Int)
            (onBox: (String, Int, Int) => Option[(String, Int, Long, Boolean)])
        : Option[(String, Int, Long, Boolean)] = {
      var i = from
      while (i + 8 <= to) {
        val size0 = be4(i); val id = tag(i + 4)
        val (hdr, size) =
          if (size0 == 1L) {
            if (i + 16 > to) return Some(bad)
            (16, be8(i + 8))
          } else if (size0 == 0L) (8, (to - i).toLong) // box runs to EOF
          else (8, size0)
        if (size < hdr || i + size > to) return Some(bad)
        val r = onBox(id, i + hdr, i + size.toInt)
        if (r.isDefined) return r
        i += size.toInt
      }
      None
    }
    if (bytes == null || bytes.length < 8 || be4(0) < 8 ||
        tag(4) != "ftyp") bad
    else {
      // the ftyp magic identified the container — every structural
      // failure from here reports format "mp4" (the png/jpeg rule)
      val mp4bad = ("mp4", 0, 0L, false)
      val r = walk(0, bytes.length) { (id, bodyFrom, bodyTo) =>
        if (id != "moov") None
        else Some(walk(bodyFrom, bodyTo) { (cid, cFrom, cTo) =>
          if (cid != "mvhd") None
          else {
            val v = if (cFrom < bodyTo) bytes(cFrom) & 0xff else -1
            if (v == 0 && cFrom + 24 <= cTo) {
              val ts = be4(cFrom + 12); val dur = be4(cFrom + 16)
              Some(if (ts >= 1 && ts <= Int.MaxValue)
                ("mp4", ts.toInt, dur, true) else mp4bad)
            } else if (v == 1 && cFrom + 32 <= cTo) {
              val ts = be4(cFrom + 20); val dur = be8(cFrom + 24)
              Some(if (ts >= 1 && ts <= Int.MaxValue && dur >= 0)
                ("mp4", ts.toInt, dur, true) else mp4bad)
            } else Some(mp4bad)
          }
        }.getOrElse(mp4bad)) // moov without mvhd
      }.getOrElse(mp4bad)    // ftyp stream without moov
      if (r._1 == "unknown") mp4bad else r // truncated/corrupt box walk
    }
  }

  /** Synthesize a GENUINE MP4 header per document — the video decode
    * fixture, closed-form from doc_id (timescale = 1000·(1 + id mod
    * 5), duration = id·37 mod 100000); every 13th doc truncates inside
    * the moov box — the valid=false path. */
  def synthVideoPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val full = mp4Payload(
            timescale = (1000 * (1 + id % 5)).toInt,
            duration = id * 37 % 100000)
          (id, if (id % 13 == 0) full.take(40) else full)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Decode MP4 metadata in executor-side batches via [[decodeVideo]] —
    * the video sibling of [[decodeMeta]]. duration_ms is the integer
    * floor of duration·1000/timescale (exact long arithmetic, the
    * oracle-stable form). */
  def decodeVideoMeta(withPayload: DataFrame): Dataset[VideoMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, ts, dur, ok) = decodeVideo(bytes)
          VideoMeta(id, fmt,
            if (bytes == null) 0L else bytes.length.toLong,
            ts, dur, if (ok) dur * 1000L / ts else 0L, valid = ok)
        }
      }
  }

  /** Decode metadata in executor-side batches (mapPartitions) via the
    * REAL header parser [[decodeImage]]. Output is a typed Dataset —
    * downstream joins/aggregations stay columnar. media_type is the
    * DETECTED format (png/jpeg/unknown), not a caller claim. */
  def decodeMeta(withPayload: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, w, h, ok) = decodeImage(bytes)
          MediaMeta(id, fmt, if (bytes == null) 0L else bytes.length.toLong,
            w, h, valid = ok)
        }
      }
  }

  /** STUB feature extraction: deterministic pseudo-embedding (dim 8) from
    * payload bytes — the plumbing for decode→embed→ANN over media. */
  def extractFeatures(withPayload: DataFrame, dim: Int = 8): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val vec = Array.tabulate(dim) { i =>
            if (bytes == null || bytes.isEmpty) 0.0f
            else {
              var acc = 1125899906842597L
              var j = i
              while (j < bytes.length) { acc = acc * 31 + bytes(j); j += dim }
              (acc % 1000) / 1000.0f
            }
          }
          (id, vec)
        }
      }
      .toDF("doc_id", "features")
  }

  /** STUB resize: recompute target dimensions preserving aspect ratio
    * against a bounding box — the metadata half of an image resize (a
    * real implementation would also re-encode the payload; the
    * dimension math, schema, and null handling are the Spark-side
    * contract). Output: doc_id, (w,h) → (out_w,out_h) scaled to fit
    * `maxSide`, never upscaled. */
  def resizeMeta(decoded: Dataset[MediaMeta], maxSide: Int = 256): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.toDF()
      .withColumn("scale",
        when(!col("valid") || (col("width") <= maxSide &&
            col("height") <= maxSide), lit(1.0))
          .otherwise(lit(maxSide.toDouble) /
            greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
  }

  /** STUB frame sampling for video payloads: every `stride`-th byte
    * offset stands in for a frame timestamp. */
  def sampleFrames(withPayload: DataFrame, stride: Int = 100): DataFrame =
    withPayload
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        sequence(lit(0), greatest(length(col("payload")) - 1, lit(0)),
          lit(stride)).as("frame_offsets"))
}
