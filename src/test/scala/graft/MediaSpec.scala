package graft

import org.apache.spark.sql.functions._

import graft.functions.BinaryFunctions
import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.{Codec, Media}

/** Specs for the multimodal plumbing: binary schema flow, batched
  * partition decode, codec determinism, and agreement between the
  * mapPartitions path and the native byte-stats expression.
  */
class MediaSpec extends GraftSpec {
  import spark.implicits._

  private val sample = Seq(
    Media(0L, "image", "hello world".getBytes("UTF-8")),
    Media(1L, "audio", Array.tabulate(100)(i => (i % 251).toByte)),
    Media(2L, "video", Array.emptyByteArray))

  test("decodeFeatures preserves ids and computes frame counts") {
    val out = MediaOps.decodeFeatures(sample.toDS(), batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L).n_bytes === 11L)
    assert(out(0L).n_frames === 1)  // 11 bytes -> one 16-byte frame
    assert(out(1L).n_frames === 7)  // 100 bytes -> ceil(100/16)=7
    assert(out(2L).n_frames === 0)
  }

  test("codec is deterministic on payload bytes") {
    val a = Codec.decode(sample(1))
    val b = Codec.decode(sample(1).copy())
    assert(a === b)
  }

  test("mapPartitions decode agrees with the native byte-stats expression") {
    val viaCodec = MediaOps.decodeFeatures(sample.toDS())
      .select(col("media_id"), col("n_bytes"), col("mean_byte"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaExpr = sample.toDS().toDF()
      .withColumn("st", BinaryFunctions.byteStats(col("payload")))
      .select(col("media_id"), col("st.n_bytes"),
        when(col("st.n_bytes") === 0, 0.0)
          .otherwise(col("st.sum_bytes").cast("double") / col("st.n_bytes")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaCodec === viaExpr)
  }

  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("REAL WAV decode recovers synthesized container ground truth") {
    // 440 samples of a square wave at 8 kHz mono 16-bit — built here,
    // parsed back through the batched decode path byte-for-byte.
    val wave = Array.tabulate(440)(i => if ((i / 10) % 2 == 0) 1000 else -1000)
      .map(_.toShort)
    val media = Seq(Media(7L, "audio", wavBytes(8000, wave)))
    val f = MediaOps.decodeFeatures(media.toDS()).collect().head
    assert(f.sample_rate === Some(8000))
    assert(f.n_samples === Some(440))
    assert(f.width === None && f.height === None)
  }

  test("wavFromBytes synthesis parses back exactly, stereo truncates to whole frames") {
    // mm_audio_meta's contract in miniature: every container field the
    // parser recovers equals the synthesis arithmetic — including the
    // edge the corpus gate may not hit on every run, an odd byte count
    // at 2 channels (7 bytes -> 6 usable -> 3 samples per channel).
    val src = Array.tabulate(7)(_.toByte)
    val stereo = Codec.wavFromBytes(src, 12000, 2)
    assert(Codec.parseWav(stereo) === Some((12000, 2, 3)))
    assert(stereo.length === 44 + 2 * 6)
    val mono = Codec.wavFromBytes(src, 8000, 1)
    assert(Codec.parseWav(mono) === Some((8000, 1, 7)))
    assert(mono.length === 44 + 2 * 7)
  }

  test("REAL PPM decode recovers image dimensions incl. header comments") {
    val header = "P6\n# synthetic test image\n5 3\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate(5 * 3 * 3)(i => (i % 256).toByte)
    val media = Seq(Media(8L, "image", header ++ pixels))
    val f = MediaOps.decodeFeatures(media.toDS()).collect().head
    assert(f.width === Some(5))
    assert(f.height === Some(3))
    assert(f.sample_rate === None)
    // truncated payload must NOT be recognized
    val bad = Media(9L, "image", header ++ pixels.take(10))
    assert(Codec.decode(bad).width === None)
  }

  test("REAL PPM nearest-neighbor resize picks the exact floor-mapped pixels") {
    // 4x4 image whose pixel (x, y) carries value 16*y + x in all three
    // channels — every source pixel is identifiable in the output
    val header = "P6\n4 4\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate(4 * 4 * 3)(i => (16 * (i / 3 / 4) + (i / 3 % 4)).toByte)
    val media = Seq(
      Media(10L, "image", header ++ pixels),
      Media(11L, "audio", wavBytes(8000, Array.tabulate(8)(_.toShort))),
      Media(12L, "video", "not an image".getBytes("UTF-8")))
    val out = MediaOps.resizeImages(media.toDS(), 2, 2)
      .collect().map(m => m.media_id -> m.payload).toMap
    // floor map: out (x, y) <- src (2x, 2y) => values 0, 2, 32, 34
    val resized = out(10L)
    val (w, h, maxval, off) = Codec.parsePpmHeader(resized).get
    assert((w, h, maxval) === ((2, 2, 255)))
    val vals = (0 until 4).map(p => resized(off + p * 3) & 0xff)
    assert(vals === Seq(0, 2, 32, 34))
    // all three channels copied, not just one
    assert(resized(off + 1) === resized(off) && resized(off + 2) === resized(off))
    // non-image payloads pass through byte-identical
    assert(out(11L).sameElements(media(1).payload))
    assert(out(12L).sameElements(media(2).payload))
    // ...INCLUDING one that happens to parse as a valid P6 image: the
    // resize is gated on the declared kind, not payload sniffing — an
    // audio blob starting with a P6 header must never be rewritten
    val disguised = Media(13L, "audio", header ++ pixels)
    val out2 = MediaOps.resizeImages(Seq(disguised).toDS(), 2, 2).collect()
    assert(out2.head.payload.sameElements(disguised.payload))
    // upscale is the same floor map: 4x4 -> 8x8 repeats each pixel 2x2
    val up = Codec.resizePpm(header ++ pixels, 8, 8).get
    val (uw, uh, _, uoff) = Codec.parsePpmHeader(up).get
    assert((uw, uh) === ((8, 8)))
    assert((up(uoff) & 0xff) === 0 && (up(uoff + 3) & 0xff) === 0 &&
      (up(uoff + 6) & 0xff) === 1)
    // source maxval < 255 is carried through, NOT re-declared as 255 —
    // copied samples keep their intensity semantics
    val dim = "P6\n4 4\n100\n".getBytes("US-ASCII") ++ pixels
    val dimOut = Codec.resizePpm(dim, 2, 2).get
    assert(Codec.parsePpmHeader(dimOut).get._3 === 100)
    // unrepresentable target (outW*outH*3 overflows Int) is rejected
    // with None, never a NegativeArraySizeException in a Spark task
    assert(Codec.resizePpm(header ++ pixels, 46341, 46341) === None)
  }

  test("resize grid property: every geometry parses back and every pixel is floor-mapped") {
    // exhaustive small-geometry sweep — the off-by-one surface of the
    // index map (first/last row/column, non-divisible ratios) is where
    // resamplers break, and a grid covers it deterministically
    for (w <- 1 to 5; h <- 1 to 5; ow <- 1 to 5; oh <- 1 to 5) {
      val src = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(w * h * 3)(i => (37 * (i / 3) % 251).toByte)
      val out = Codec.resizePpm(src, ow, oh)
        .getOrElse(fail(s"resize $w x $h -> $ow x $oh returned None"))
      val (pw, ph, _, off) = Codec.parsePpmHeader(out).get
      assert((pw, ph) === ((ow, oh)))
      val (_, _, _, soff) = Codec.parsePpmHeader(src).get
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3) {
        val (sx, sy) = (x * w / ow, y * h / oh)
        assert(out(off + (y * ow + x) * 3 + c) ===
          src(soff + (sy * w + sx) * 3 + c),
          s"pixel ($x,$y) ch $c of $w x $h -> $ow x $oh")
      }
    }
  }

  test("malformed media is rejected, not crashed on") {
    // PCM with bits_per_sample = 4: bits/8 would divide by zero
    val wav4 = wavBytes(8000, Array.tabulate(8)(_.toShort))
    wav4(34) = 4 // bits_per_sample LE16 low byte
    assert(Codec.parseWav(wav4) === None)
    // huge claimed dimensions: w*h*3 overflows Int; the length check
    // must still reject the tiny payload
    val huge = "P6\n50000 50000\n255\n".getBytes("US-ASCII") ++ Array.fill(30)(1.toByte)
    assert(Codec.parsePpm(huge) === None)
    // 16-bit-per-sample PPM (maxval > 255) is out of parser scope
    val deep = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill(24)(1.toByte)
    assert(Codec.parsePpm(deep) === None)
    // crafted RIFF chunk size near Int.MaxValue: `i + 8 + sz` wraps
    // negative in Int arithmetic — the bound check must reject it (in
    // Long), not walk to a negative offset and crash
    val evil = wavBytes(8000, Array.tabulate(8)(_.toShort))
    val sz = 0x7ffffff0
    evil(16) = (sz & 0xff).toByte         // fmt chunk size LE32
    evil(17) = ((sz >> 8) & 0xff).toByte
    evil(18) = ((sz >> 16) & 0xff).toByte
    evil(19) = ((sz >> 24) & 0xff).toByte
    assert(Codec.parseWav(evil) === None)
  }

  test("opaque payloads fall back to byte-stats fake with no container fields") {
    val f = Codec.decode(sample(1))
    assert(f.width === None && f.sample_rate === None)
    assert(f.n_bytes === 100L)
  }

  test("phash: resize twins hash identically, perturbations move few bits, non-images null") {
    // synth image from a deterministic byte pattern
    val src = (0 until 300).map(i => ((i * 37 + 11) % 251).toByte).toArray
    val img = Codec.ppmFromBytes(src, 16, 16)
    val orig = Codec.phashBands(img).get
    assert(orig.length === 8 && orig.forall(b => b >= 0 && b <= 255))
    // resize 16×16 → 8×8 through the REAL codec: the 8×8 phash grid
    // lands exactly on the original's sampled pixels → identical hash
    val twin = Codec.resizePpm(img, 8, 8).get
    assert(Codec.phashBands(twin).get === orig)
    // flipping ONE sampled pixel to an extreme moves only a few bits:
    // locate grid pixel (0,0)'s bytes right after the header
    val off = Codec.parsePpmHeader(img).get._4
    val pert = img.clone()
    pert(off) = 0xff.toByte; pert(off + 1) = 0xff.toByte; pert(off + 2) = 0xff.toByte
    val pb = Codec.phashBands(pert).get
    val ham = (0 until 8).map(k => Integer.bitCount(orig(k) ^ pb(k))).sum
    assert(ham > 0 && ham <= 7,
      s"one-pixel perturbation must move few bits, moved $ham")
    // pigeonhole: with ≤7 differing bits at least one band is equal —
    // the property banded candidate generation relies on for recall
    assert((0 until 8).exists(k => orig(k) == pb(k)))
    // a payload that is not a P6 image hashes to null, in the codec
    // and through the native expression
    assert(Codec.phashBands("not an image".getBytes) === None)
    val viaExpr = Seq((1L, img), (2L, "nope".getBytes))
      .toDF("id", "payload")
      .select(col("id"), BinaryFunctions.ppmPhashBands(col("payload")).as("b"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(viaExpr === Map(1L -> false, 2L -> true))
  }

  test("REAL PNG codec: lossless round-trip, header parse, decode metadata") {
    val src = (0 until 300).map(i => ((i * 31 + 7) % 253).toByte).toArray
    val ppm = Codec.ppmFromBytes(src, 16, 16)
    val png = Codec.ppmToPng(ppm).get
    // it IS a PNG (signature + IHDR) and the header parse recovers dims
    assert(Codec.parsePng(png) === Some((16, 16)))
    // ImageIO decode back to P6 is BYTE-IDENTICAL — PNG is lossless,
    // which is what lets the compressed path share the P6 oracles
    val back = Codec.pngToPpm(png).get
    assert(back === ppm)
    // decode() fills container metadata from the real PNG header
    val f = Codec.decode(Media(7L, "image", png))
    assert(f.width === Some(16) && f.height === Some(16))
    assert(f.sample_rate === None)
    // non-PNG bytes are rejected, not crashed on
    assert(Codec.parsePng(ppm) === None)
    assert(Codec.pngToPpm("not a png".getBytes) === None)
    // truncated signature / bogus dims
    assert(Codec.parsePng(png.take(20)) === None)
  }

  test("PNG → phash near-dup pipeline: full recall through the real compressed codec") {
    // The production shape: compressed payloads arrive, the decode
    // stage (transcodeImages/ImageIO) inflates to P6, the native
    // phash + banded join finds near-dups. Driven over the same
    // corpus as mm_dedup_phash with synthesis routed through
    // PNG-encode → ImageIO-decode: every per-image phash must equal
    // the direct path's (losslessness, end-to-end), so the planted
    // resize twins are found with recall 1.0 by construction.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def bands(viaPng: Boolean): Map[Long, Seq[Int]] =
      graft.queries.MultimodalQueries.imageMediaRows(docs, viaPng = viaPng)
        .toDF()
        .select(col("media_id"),
          BinaryFunctions.ppmPhashBands(col("payload")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val direct = bands(viaPng = false)
    val viaPng = bands(viaPng = true)
    assert(direct.nonEmpty)
    assert(viaPng === direct,
      "PNG round-trip must be phash-identical to the direct synthesis")
    // planted twins hash identically through the compressed path too
    val twinned = viaPng.keys.filter(_ >= 10000000L)
    assert(twinned.nonEmpty)
    twinned.foreach(t => assert(viaPng(t) === viaPng(t - 10000000L)))
  }

  test("phash geometry knob: 16×16/16-band hashes, pigeonhole exactness, twin recall") {
    // The billion-image configuration (MultimodalQueries scale-knob
    // doc): 256-bit hash as 16 bands of 16 bits. Twin-equality needs
    // image dims that are multiples of the GRID, so synthesize 32×32
    // and resize 32×32 → 16×16 — the 16×16 grid then lands exactly on
    // the original's sampled pixels.
    val src = (0 until 400).map(i => ((i * 37 + 11) % 251).toByte).toArray
    val img = Codec.ppmFromBytes(src, 32, 32)
    val orig = Codec.phashBands(img, grid = 16, nBands = 16).get
    assert(orig.length === 16 && orig.forall(b => b >= 0 && b <= 0xffff))
    val twin = Codec.resizePpm(img, 16, 16).get
    assert(Codec.phashBands(twin, grid = 16, nBands = 16).get === orig)
    // perturb ONE sampled grid pixel to an extreme: few bits move, and
    // by pigeonhole (≤ 15 differing bits over 16 bands) at least one
    // band must stay equal — the exactness contract banded candidate
    // generation relies on at hamming ≤ nBands − 1
    val off = Codec.parsePpmHeader(img).get._4
    val pert = img.clone()
    pert(off) = 0xff.toByte; pert(off + 1) = 0xff.toByte; pert(off + 2) = 0xff.toByte
    val pb = Codec.phashBands(pert, grid = 16, nBands = 16).get
    val ham = (0 until 16).map(k => Integer.bitCount(orig(k) ^ pb(k))).sum
    assert(ham > 0 && ham <= 15,
      s"one-pixel perturbation must move few bits, moved $ham")
    assert((0 until 16).exists(k => orig(k) == pb(k)))
    // the geometry reaches the expression surface: DataFrame overload
    // and the 3-arg SQL form agree with the codec
    GraftExtensions.install(spark)
    val viaExpr = Seq((1L, img)).toDF("id", "payload")
      .select(BinaryFunctions.ppmPhashBands(col("payload"), 16, 16).as("b"))
      .head().getSeq[Int](0)
    assert(viaExpr === orig.toSeq)
    val viaSql = Seq((1L, img)).toDF("id", "payload")
      .createOrReplaceTempView("phash_geom_probe")
    val sqlBands = spark.sql(
      "SELECT ppm_phash_bands(payload, 16, 16) AS b FROM phash_geom_probe")
      .head().getSeq[Int](0)
    assert(sqlBands === orig.toSeq)
    // invalid geometry raises at construction, not mid-scan
    intercept[IllegalArgumentException] {
      Codec.phashBands(img, grid = 16, nBands = 3)
    }
    // overflow-class geometries must FAIL validation, not slip through
    // an Int-wrapped grid*grid and crash mid-scan (65536² wraps to 0 —
    // division by zero; 46341² wraps negative — negative array size)
    intercept[IllegalArgumentException] {
      Codec.phashBands(img, grid = 65536, nBands = 8)
    }
    intercept[IllegalArgumentException] {
      Codec.phashBands(img, grid = 46341, nBands = 5)
    }
    // even a divisible/narrow-band pairing must fail once grid² no
    // longer fits an Int (46341² % 79536603 == 0 with quotient 27 —
    // it would pass a guard that only checked the band clauses)
    intercept[IllegalArgumentException] {
      Codec.phashBands(img, grid = 46341, nBands = 79536603)
    }
  }

  test("mm_dedup_phash reports every planted resize twin (recall 1.0)") {
    val d = "/root/testdata/sf0.001"
    val pairs = graft.queries.MultimodalQueries
      .queries("mm_dedup_phash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted positives: every image doc with doc_id % 6 == 0 has a
    // resized twin at id + 10000000 with an identical phash
    val expected = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 6 === 0 && length(col("text")) > 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (id, id + 10000000L)).toSet
    assert(expected.nonEmpty)
    assert(expected.subsetOf(pairs),
      s"missing planted twins: ${expected -- pairs}")
  }

  test("JPEG decode-only: header dims exact, transcode within tolerance, non-oracle") {
    // Synthesize a real JPEG (ImageIO encoder) from a smooth P6 — a
    // gradient compresses with small per-pixel error, so the tolerance
    // assertion is meaningful rather than vacuous.
    val w = 32; val h = 32
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val pixels = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (4 * (p % w) + 4 * (p / w)).toByte // smooth diagonal luma ramp
    }
    val ppm = header ++ pixels
    val jpg = Codec.ppmToJpeg(ppm).get
    // it IS a JPEG and the SOF header parse recovers exact dimensions
    // (container structure — deterministic even though pixels aren't)
    assert(Codec.parseJpeg(jpg) === Some((w, h)))
    assert(Codec.parseJpeg(ppm) === None)
    assert(Codec.parseJpeg("not a jpeg".getBytes) === None)
    assert(Codec.parseJpeg(jpg.take(3)) === None)
    // standalone markers (TEM 0x01, RST0-7 0xD0-0xD7) carry NO length
    // field — the walk must skip them with i += 2 instead of misreading
    // the following bytes as a segment size (which would walk off the
    // chain and lose the SOF of a valid-but-unusual JPEG)
    val standalone = Array(0xff, 0xd8, 0xff, 0x01, 0xff, 0xd0,
      0xff, 0xc0, 0x00, 0x07, 0x08, 0x00, 0x20, 0x00, 0x20).map(_.toByte)
    assert(Codec.parseJpeg(standalone) === Some((32, 32)))
    // truncated right after a standalone marker: clean None, no misparse
    assert(Codec.parseJpeg(standalone.take(6)) === None)
    // decode() fills container metadata from the JPEG header
    val f = Codec.decode(Media(9L, "image", jpg))
    assert(f.width === Some(w) && f.height === Some(h) && f.sample_rate === None)
    // transcodeImages inflates the JPEG to P6: exact dims, and the
    // pixels must equal what THIS JVM's own decoder produces for the
    // same bytes — the tolerance reference is the codec actually in
    // use, so the assertion cannot flake on a different JDK/ImageIO
    // plugin's rounding (an absolute bound vs the source would)
    val out = MediaOps.transcodeImages(Seq(Media(9L, "image", jpg)).toDS())
      .collect().head.payload
    val (dw, dh, _, doff) = Codec.parsePpmHeader(out).get
    assert((dw, dh) === ((w, h)))
    val redecoded = Codec.jpegToPpm(jpg).get
    assert(out.sameElements(redecoded),
      "transcodeImages diverged from this JVM's own jpegToPpm decode")
    // lossy-but-CLOSE sanity vs the source: deliberately loose bounds
    // (garbage-detection, not a quality floor — quality is the
    // encoder's business and varies across JDKs)
    val srcOff = Codec.parsePpmHeader(ppm).get._4
    val maxErr = (0 until w * h * 3).map(i =>
      math.abs((out(doff + i) & 0xff) - (ppm(srcOff + i) & 0xff))).max
    assert(maxErr <= 96, s"JPEG round-trip error too large: $maxErr")
    val meanSrc = (0 until w * h * 3).map(i => ppm(srcOff + i) & 0xff).sum.toDouble / (w * h * 3)
    val meanOut = (0 until w * h * 3).map(i => out(doff + i) & 0xff).sum.toDouble / (w * h * 3)
    assert(math.abs(meanSrc - meanOut) <= 16.0)
    // non-image kinds never decode, even with a JPEG payload
    val audio = MediaOps.transcodeImages(Seq(Media(10L, "audio", jpg)).toDS())
      .collect().head.payload
    assert(audio.sameElements(jpg))
  }

  test("ppmToPng/ppmToJpeg reject maxval != 255 instead of darkening") {
    // samples are copied as 8-bit channel values, which is only
    // lossless at maxval 255 — a maxval-100 P6 would be semantically
    // darkened and the round-trip would re-declare 255; the encoders
    // must return None rather than encode that
    val dim = "P6\n2 2\n100\n".getBytes("US-ASCII") ++ Array.fill(12)(50.toByte)
    assert(Codec.ppmToPng(dim) === None)
    assert(Codec.ppmToJpeg(dim) === None)
    val full = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(50.toByte)
    assert(Codec.ppmToPng(full).isDefined)
    assert(Codec.ppmToJpeg(full).isDefined)
  }

  test("PpmPhashBands invalid geometry fails at expression construction, not mid-scan") {
    // the DataFrame overload constructs the expression at plan time —
    // a bad (grid, nBands) must throw HERE, before any task runs
    intercept[IllegalArgumentException] {
      BinaryFunctions.ppmPhashBands(col("payload"), 16, 3)
    }
    intercept[IllegalArgumentException] {
      BinaryFunctions.ppmPhashBands(col("payload"), 46341, 5)
    }
    // and through the SQL surface: analysis-time failure (the function
    // builder runs during analysis), surfaced as an AnalysisException
    // wrapping the geometry error — never a task-level error mid-scan
    GraftExtensions.install(spark)
    Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .createOrReplaceTempView("phash_geom_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT ppm_phash_bands(payload, 16, 3) FROM phash_geom_bad")
    }
    assert(e.getMessage.contains("phash geometry") ||
      Option(e.getCause).exists(_.getMessage.contains("phash geometry")))
  }

  test("header parsers never crash or hang on arbitrary bytes (deterministic fuzz)") {
    // The parsers run inside executor tasks over untrusted payload
    // bytes — any crash class (index out of bounds, divide by zero,
    // negative array size, non-termination in the JPEG marker walk)
    // would fail tasks at scale. Deterministic seed: failures
    // reproduce.
    val rnd = new scala.util.Random(421)
    def parsersSurvive(b: Array[Byte]): Unit = {
      Codec.parseWav(b); Codec.parsePpmHeader(b); Codec.parsePng(b)
      Codec.parseJpeg(b); ()
    }
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(b)
      parsersSurvive(b)
    }
    // structured prefixes with random tails — exercises deeper walk
    // paths than pure noise (signatures match, then garbage)
    val jpegSig = Array(0xff, 0xd8, 0xff).map(_.toByte)
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val wavSig = "RIFF????WAVE".getBytes("US-ASCII")
    val ppmSig = "P6\n".getBytes("US-ASCII")
    (0 until 500).foreach { _ =>
      val tail = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(tail)
      Seq(jpegSig, pngSig, wavSig, ppmSig).foreach(sig =>
        parsersSurvive(sig ++ tail))
    }
    // every truncation of a REAL JPEG: the marker walk must reject,
    // not overrun (same guarantee the PPM/WAV parsers already pin)
    val ppm = Codec.ppmFromBytes((0 until 120).map(_.toByte).toArray, 8, 8)
    val jpg = Codec.ppmToJpeg(ppm).get
    (0 until jpg.length).foreach(n => parsersSurvive(jpg.take(n)))
    assert(Codec.parseJpeg(jpg) === Some((8, 8))) // the untruncated one parses
  }

  test("byteStats handles unsigned bytes and empty payloads") {
    val df = Seq(
      (1L, Array(0xff.toByte, 0x00.toByte)),
      (2L, Array.emptyByteArray)).toDF("id", "payload")
      .withColumn("st", BinaryFunctions.byteStats(col("payload")))
    val r1 = df.filter(col("id") === 1).select("st.*").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getInt(2), r1.getInt(3)) ===
      ((2L, 255L, 0, 255)))
    val r2 = df.filter(col("id") === 2).select("st.*").head()
    assert(r2.getLong(0) === 0L && r2.isNullAt(2) && r2.isNullAt(3))
  }
}
