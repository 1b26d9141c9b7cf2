package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video handled as opaque
  * `binary` payload columns with typed metadata, processed in batched
  * partition iterators (the JVM analogue of mapInPandas-style
  * vectorized UDFs: one decoder instantiation per batch, records
  * streamed through it, no driver collection).
  *
  * The codec REALLY decodes four formats — RIFF/WAV (PCM audio) and
  * PPM P6 (binary RGB images), both pure byte arithmetic, plus the two
  * major COMPRESSED image formats: PNG (header-parsed for metadata,
  * inflated through the JDK's ImageIO into P6 — lossless, so it stays
  * inside oracle-gated exactness) and JPEG (DECODE-ONLY: SOF-header
  * dimensions are deterministic container structure; decoded pixels
  * are tolerance-checked in MediaSpec but kept out of oracle-gated
  * paths because JPEG decoder rounding may vary across JDK versions).
  * MediaSpec proves recovery of synthesized ground truth end-to-end
  * through the batched path, and a PNG → phash near-dup pipeline with
  * full recall. Payloads that are none of the four fall back to a
  * deterministic byte-stats fake, standing in for the codecs the JDK
  * lacks (FLAC/H.264) — swapping that fallback for a JNI/FFI codec is
  * the only change a real deployment needs.
  */
object MediaOps {

  /** An opaque media record: payload plus typed metadata. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded per-media features. Byte-level stats always present;
    * container fields (width/height for images, sample_rate/n_samples
    * for audio) filled only when a real parser recognized the payload.
    */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, n_frames: Int, signature: Long,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_samples: Option[Int])

  object Codec {
    val FrameBytes = 16

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def ascii(b: Array[Byte], i: Int, n: Int): String =
      new String(b, i, n, "US-ASCII")

    /** REAL RIFF/WAV parse: walk the chunk list, read PCM params from
      * `fmt `, count samples from `data`. Returns (sampleRate, channels,
      * nSamplesPerChannel) or None if not a well-formed PCM WAV.
      */
    private[graft] def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 44 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
        return None
      var i = 12
      var rate = -1; var channels = -1; var bits = -1; var dataLen = -1
      while (i + 8 <= b.length) {
        val id = ascii(b, i, 4)
        val sz = le32(b, i + 4)
        // Long arithmetic: a crafted chunk size near Int.MaxValue makes
        // `i + 8 + sz` wrap negative in Int, bypassing the bound check
        // and crashing the walk below — same overflow guard as parsePpm.
        if (sz < 0 || i.toLong + 8L + sz.toLong > b.length) return None
        if (id == "fmt " && sz >= 16) {
          if (le16(b, i + 8) != 1) return None // PCM only
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          bits = le16(b, i + 22)
        } else if (id == "data") dataLen = sz
        i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      // bits must be a positive multiple of 8: bits/8 == 0 for 1..7
      // would divide by zero on a corrupt file mislabeled PCM
      if (rate <= 0 || channels <= 0 || bits < 8 || bits % 8 != 0 || dataLen < 0) None
      else Some((rate, channels, dataLen / (bits / 8) / channels))
    }

    /** REAL PPM P6 parse: ASCII header (width height maxval) then raw
      * RGB triplets. Returns (width, height, maxval, dataOffset) or None.
      */
    private[graft] def parsePpmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
      var i = 2
      val fields = new scala.collection.mutable.ArrayBuffer[Int](3)
      while (fields.length < 3 && i < b.length) {
        while (i < b.length && b(i).toChar.isWhitespace) i += 1
        if (i < b.length && b(i) == '#') { // comment line
          while (i < b.length && b(i) != '\n') i += 1
        } else {
          var v = 0; var any = false
          while (i < b.length && b(i).toChar.isDigit) {
            v = v * 10 + (b(i) - '0'); i += 1; any = true
          }
          if (!any) return None
          fields += v
        }
      }
      if (fields.length < 3) return None
      val (w, h, maxval) = (fields(0), fields(1), fields(2))
      // single whitespace after maxval, then w*h*3 payload bytes.
      // Long arithmetic: huge claimed dimensions must fail the length
      // check, not overflow Int and pass it. maxval > 255 (2-byte
      // samples) is out of scope for this parser.
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
          b.length.toLong < i.toLong + 1L + w.toLong * h.toLong * 3L) None
      else Some((w, h, maxval, i + 1))
    }

    private[graft] def parsePpm(b: Array[Byte]): Option[(Int, Int)] =
      parsePpmHeader(b).map { case (w, h, _, _) => (w, h) }

    /** REAL nearest-neighbor PPM resize: source pixel for output (x, y)
      * is (x·w div outW, y·h div outH) — the standard floor index map,
      * pure integer arithmetic, deterministic on any engine. The source
      * maxval is carried into the output header unchanged (samples are
      * copied, not rescaled — re-declaring 255 would silently darken a
      * maxval<255 image). Returns the re-encoded P6 payload, or None
      * when the input is not a well-formed P6 image OR the target size
      * is not representable (the caller decides pass-through vs drop).
      */
    private[graft] def resizePpm(b: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
      // Long guard: outW*outH*3 must not overflow Int (the adjacent
      // parsers guard the same class of overflow on the input side)
      if (outW <= 0 || outH <= 0 ||
          outW.toLong * outH.toLong * 3L > Int.MaxValue - 64L) return None
      parsePpmHeader(b).map { case (w, h, maxval, off) =>
        val header = s"P6\n$outW $outH\n$maxval\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + outW * outH * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        var o = header.length
        while (y < outH) {
          val sy = (y.toLong * h / outH).toInt
          var x = 0
          while (x < outW) {
            val sx = (x.toLong * w / outW).toInt
            val si = off + (sy * w + sx) * 3
            out(o) = b(si); out(o + 1) = b(si + 1); out(o + 2) = b(si + 2)
            o += 3; x += 1
          }
          y += 1
        }
        out
      }
    }

    /** Encode a P6 payload whose pixel bytes CYCLE through `src` —
      * the deterministic image synthesizer for gate data: real header,
      * real pixel layout, content derived from the document so the
      * DuckDB oracle can recompute every pixel from the text.
      */
    private[graft] def ppmFromBytes(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && src.nonEmpty,
        "ppmFromBytes needs positive dims and a non-empty source")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var j = 0
      while (j < w * h * 3) {
        out(header.length + j) = src(j % src.length)
        j += 1
      }
      out
    }

    /** Deterministic RIFF/WAV synthesis — the audio twin of
      * ppmFromBytes: 16-bit PCM, one sample per source byte
      * (value (b − 128)·256), truncated to a whole number of
      * per-channel frames so `data` splits evenly across channels.
      * Every container field is a pure function of (src.length, rate,
      * channels), which is what lets the DuckDB oracle state the
      * parse-back result without a binary parser (mm_audio_meta).
      */
    private[graft] def wavFromBytes(src: Array[Byte], rate: Int,
                                    channels: Int): Array[Byte] = {
      require(rate > 0 && channels > 0, "wavFromBytes needs positive params")
      val nUsable = src.length - src.length % channels
      val dataLen = 2 * nUsable
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var j = 0
      while (j < nUsable) {
        bb.putShort((((src(j) & 0xff) - 128) * 256).toShort)
        j += 1
      }
      bb.array()
    }

    /** PERCEPTUAL HASH of a P6 payload with a PARAMETERIZED geometry,
      * returned as `nBands` bands of grid²/nBands bits each (band k =
      * hash bits [k·bandBits, (k+1)·bandBits)): nearest-neighbor
      * downsample to a grid×grid luma grid (the same floor index map
      * as resizePpm, so resize-then-hash equals hash when both image
      * dims are multiples of the grid), ITU-R 601 integer luma
      * (299r+587g+114b)/1000, threshold strictly above the floor mean.
      * Pure integer arithmetic — bit-identical in any engine — and
      * None when the payload is not a well-formed P6 image.
      *
      * Geometry IS the scale knob: banded candidate volume is
      * ~corpus²/2^bandBits per band, and ≤(nBands−1) hamming is exact
      * by pigeonhole. The 8×8/8-band default (64-bit hash, 256 buckets
      * per band, exact to hamming 7) fits corpus-scale gates; a
      * billion-image corpus runs 16×16/16 bands (256-bit hash, 65 536
      * buckets per band, exact to hamming 15) — same code, one
      * argument.
      */
    private[graft] def phashBands(b: Array[Byte], grid: Int = 8,
                                  nBands: Int = 8): Option[Array[Int]] = {
      // Long arithmetic in the guard AND a cell-count ceiling: grid*grid
      // in Int overflows for grid >= 46341 and would PASS a naive check
      // (cells = 0 or negative) only to crash mid-scan — the same
      // overflow class the parsers guard. The Int.MaxValue clause keeps
      // the body's Int cell arithmetic exact for every geometry that
      // validates.
      require(grid > 0 && nBands > 0 &&
        grid.toLong * grid <= Int.MaxValue &&
        (grid.toLong * grid) % nBands == 0 &&
        grid.toLong * grid / nBands <= 31,
        s"phash geometry $grid×$grid/$nBands: cells must fit an Int and " +
          "split evenly into bands of <= 31 bits (band values are Ints)")
      parsePpmHeader(b).map { case (w, h, _, off) =>
        val cells = grid * grid
        val bandBits = cells / nBands
        val luma = new Array[Long](cells)
        var sum = 0L
        var i = 0
        while (i < cells) {
          val sx = ((i % grid).toLong * w / grid).toInt
          val sy = ((i / grid).toLong * h / grid).toInt
          val si = off + (sy * w + sx) * 3
          val l = (299 * (b(si) & 0xff) + 587 * (b(si + 1) & 0xff) +
            114 * (b(si + 2) & 0xff)) / 1000
          luma(i) = l
          sum += l
          i += 1
        }
        val mean = sum / cells
        val bands = new Array[Int](nBands)
        i = 0
        while (i < cells) {
          if (luma(i) > mean) bands(i / bandBits) |= 1 << (i % bandBits)
          i += 1
        }
        bands
      }
    }

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    /** REAL PNG header parse (pure bytes, no decoder): signature +
      * leading IHDR chunk → (width, height). The container-metadata
      * path for PNG payloads — decode() fills width/height from it
      * without inflating the pixel data.
      */
    private[graft] def parsePng(b: Array[Byte]): Option[(Int, Int)] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (b.length < 24 || !sig.indices.forall(i => b(i) == sig(i))) return None
      if (ascii(b, 12, 4) != "IHDR") return None // IHDR is mandatory-first
      val (w, h) = (be32(b, 16), be32(b, 20))
      if (w <= 0 || h <= 0) None else Some((w, h))
    }

    /** REAL PNG decode via the JDK's ImageIO (javax.imageio ships in
      * every JRE — no external dependency): the payload is inflated
      * and re-encoded as P6, the codec's uncompressed interchange
      * form, so everything downstream (phash, resize, byte features)
      * is format-agnostic. PNG is lossless, so our own ppmToPng
      * round-trips byte-identically (MediaSpec). None when the payload
      * is not a PNG or ImageIO cannot decode it. This retires the
      * deterministic stand-in for the PNG format; the stand-in remains
      * only for formats the JDK lacks (JPEG is ImageIO-decodable too
      * but non-deterministic across JDK decoder versions, so it stays
      * out of oracle-gated paths).
      */
    /** ImageIO defaults to a DISK-backed stream cache — one temp-file
      * create/write/delete per decoded record, pure syscall waste for
      * payloads already in memory. Disabled once per JVM before the
      * first codec use (transcodeImages is a per-record hot path).
      */
    private lazy val imageIoNoDiskCache: Unit =
      javax.imageio.ImageIO.setUseCache(false)

    /** BufferedImage → P6 re-encode, shared by the PNG and JPEG decode
      * paths (one definition of the interchange form).
      */
    private def bufferedToPpm(im: java.awt.image.BufferedImage): Array[Byte] = {
      val (w, h) = (im.getWidth, im.getHeight)
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          out(o) = ((rgb >> 16) & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = (rgb & 0xff).toByte
          o += 3; x += 1
        }
        y += 1
      }
      out
    }

    private[graft] def pngToPpm(b: Array[Byte]): Option[Array[Byte]] = {
      imageIoNoDiskCache
      if (parsePng(b).isEmpty) return None
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        .map(bufferedToPpm)
    }

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** REAL JPEG/JFIF header parse (pure bytes, no decoder): SOI, then
      * walk the marker segments to the first frame header (SOF0..SOF15
      * minus DHT/JPG/DAC, which reuse the 0xC* range) and read
      * (width, height) from it. Deterministic — the dimensions are
      * container structure, independent of any decoder — so it is safe
      * on metadata paths even though JPEG PIXEL decode stays out of
      * oracle-gated exactness (decoder output varies across JDKs).
      */
    private[graft] def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        var m = b(i + 1) & 0xff
        // fill bytes: consecutive 0xFF before a marker are padding
        while (m == 0xff && i + 5 <= b.length) { i += 1; m = b(i + 1) & 0xff }
        if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          // TEM / RSTn are standalone markers with NO length field —
          // reading be16 here would misparse the following bytes as a
          // segment size and walk off the marker chain
          i += 2
        } else {
          val sz = be16(b, i + 2)
          if (sz < 2 || i.toLong + 2L + sz.toLong > b.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (sz < 7) return None // precision(1) + height(2) + width(2)
            val h = be16(b, i + 5)
            val w = be16(b, i + 7)
            return if (w <= 0 || h <= 0) None else Some((w, h))
          }
          i += 2 + sz
        }
      }
      None
    }

    /** JPEG decode via ImageIO → P6 — the DECODE-ONLY half of JPEG
      * support: transcodeImages accepts JPEG payloads, but the decoded
      * pixels are NOT oracle-gated (JPEG decoders may differ in
      * rounding across JDK versions; MediaSpec asserts dimensions
      * exactly and byte stats within tolerance instead). Oracle-gated
      * exactness stays on PNG/PPM, whose decode is bit-determined.
      */
    private[graft] def jpegToPpm(b: Array[Byte]): Option[Array[Byte]] = {
      imageIoNoDiskCache
      if (parseJpeg(b).isEmpty) return None
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        .map(bufferedToPpm)
    }

    /** Decode any recognized COMPRESSED image payload to P6 (PNG
      * losslessly; JPEG decode-only, see jpegToPpm) — the sniff order
      * is cheap-header-first, and a payload neither recognizes returns
      * None (transcodeImages passes it through untouched).
      */
    private[graft] def compressedToPpm(b: Array[Byte]): Option[Array[Byte]] =
      pngToPpm(b).orElse(jpegToPpm(b))

    /** Encode a P6 payload as real JPEG bytes via ImageIO — synthesis
      * aid ONLY (lets specs drive the JPEG decode path with real
      * compressed input); lossy by nature, so unlike ppmToPng there is
      * no round-trip identity to claim.
      *
      * CONTRACT — None means ONE OF TWO things (same as ppmToPng; do
      * NOT read None as "not a P6"):
      *   (a) the payload is not a parseable P6, or
      *   (b) the payload IS a valid P6 whose maxval != 255 — encodable
      *       only by darkening, so refused (MediaSpec pins both cases).
      */
    private[graft] def ppmToJpeg(ppm: Array[Byte]): Option[Array[Byte]] = {
      imageIoNoDiskCache
      parsePpmHeader(ppm).filter(_._3 == 255).map { case (w, h, _, off) =>
        val im = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        var i = off
        while (y < h) {
          var x = 0
          while (x < w) {
            im.setRGB(x, y,
              ((ppm(i) & 0xff) << 16) | ((ppm(i + 1) & 0xff) << 8) |
                (ppm(i + 2) & 0xff))
            i += 3; x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "jpg", baos)
        baos.toByteArray
      }
    }

    /** Encode a P6 payload as real PNG bytes via ImageIO — the
      * sink-side half of the PNG codec (and the synthesis aid that
      * lets specs drive a true compressed-format pipeline). Samples
      * are copied as 8-bit channel values, which is only lossless for
      * maxval = 255 — a maxval < 255 P6 would be semantically darkened
      * (and pngToPpm would re-declare 255 on the way back, breaking
      * the round-trip identity), so those inputs return None rather
      * than encode something the format path cannot represent
      * losslessly. pngToPpm(ppmToPng(p)) == p for every accepted p.
      *
      * CONTRACT — None means ONE OF TWO things (do NOT read None as
      * "not a P6"):
      *   (a) the payload is not a parseable P6, or
      *   (b) the payload IS a valid P6 whose maxval != 255 — valid but
      *       not losslessly encodable here, so refused.
      * A caller that needs to distinguish the two must parsePpmHeader
      * first; MediaSpec's rejection test pins case (b) and must stay
      * co-located with any new caller.
      */
    private[graft] def ppmToPng(ppm: Array[Byte]): Option[Array[Byte]] = {
      imageIoNoDiskCache
      parsePpmHeader(ppm).filter(_._3 == 255).map { case (w, h, _, off) =>
        val im = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        var i = off
        while (y < h) {
          var x = 0
          while (x < w) {
            im.setRGB(x, y,
              ((ppm(i) & 0xff) << 16) | ((ppm(i + 1) & 0xff) << 8) |
                (ppm(i + 2) & 0xff))
            i += 3; x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", baos)
        baos.toByteArray
      }
    }

    def decode(m: Media): MediaFeatures = {
      val bytes = m.payload
      var sum = 0L
      var sig = 1469598103934665603L // FNV-1a offset basis
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        sig = (sig ^ b) * 1099511628211L
        i += 1
      }
      val n = bytes.length
      val wav = parseWav(bytes)
      val ppm = if (wav.isEmpty) parsePpm(bytes) else None
      // PNG/JPEG: real container parses (header only — no inflate
      // needed for metadata; JPEG dims come from the SOF segment, a
      // deterministic container field), after the cheaper sniffs miss
      val png = if (wav.isEmpty && ppm.isEmpty) parsePng(bytes) else None
      val jpg =
        if (wav.isEmpty && ppm.isEmpty && png.isEmpty) parseJpeg(bytes) else None
      val img = ppm.orElse(png).orElse(jpg)
      MediaFeatures(
        m.media_id, m.kind, n.toLong,
        if (n == 0) 0.0 else sum.toDouble / n,
        (n + FrameBytes - 1) / FrameBytes,
        sig,
        width = img.map(_._1), height = img.map(_._2),
        sample_rate = wav.map(_._1), n_samples = wav.map(_._3))
    }
  }

  /** Present `documents` as a media table: payload = utf-8 bytes, kind
    * assigned deterministically. At 100 TB the payload column would be
    * real image/audio bytes read from parquet/lance; everything
    * downstream is agnostic to that.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** Batched decode: each partition streams through the codec in
    * batches of `batchSize` (decoder state amortized per batch, bounded
    * memory). This is the mapInPandas shape on the JVM: iterator-of-
    * batches in, iterator-of-results out, executed per partition with
    * no shuffle.
    */
  def decodeFeatures(ds: Dataset[Media], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { records =>
      records.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here (native handles etc.)
        batch.iterator.map(Codec.decode)
      }
    }
  }

  /** Partition-streaming image resize: PPM P6 payloads are
    * nearest-neighbor resampled to (outW, outH) and re-encoded; every
    * other payload passes through byte-identical (a resize stage must
    * not corrupt the audio/video rows sharing the column) — gated on
    * the row's declared kind, not just payload sniffing, so an
    * audio/video payload that coincidentally parses as a P6 header is
    * never silently rewritten. resizePpm is a pure per-record function,
    * so unlike decodeFeatures there is no per-batch decoder state to
    * amortize and no batching layer. Per-record work is O(outW·outH);
    * no shuffle at any scale.
    */
  def resizeImages(ds: Dataset[Media], outW: Int, outH: Int): Dataset[Media] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else Codec.resizePpm(m.payload, outW, outH)
        .map(p => m.copy(payload = p)).getOrElse(m)
    })
  }

  /** The DECODE stage of the multimodal pipeline with a REAL
    * compressed codec: image payloads that are PNG or JPEG are
    * inflated through the JDK's ImageIO and re-encoded as P6 (the
    * codec's interchange form every downstream operator speaks);
    * everything else passes through byte-identical. PNG decode is
    * lossless and oracle-gated; JPEG is DECODE-ONLY support (exact
    * dimensions, tolerance-checked pixels — see Codec.jpegToPpm).
    * Pure per-record function, partition-streaming, no shuffle at any
    * scale — the compressed bytes never leave the task that decodes
    * them.
    */
  def transcodeImages(ds: Dataset[Media]): Dataset[Media] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else Codec.compressedToPpm(m.payload)
        .map(p => m.copy(payload = p)).getOrElse(m)
    })
  }
}
