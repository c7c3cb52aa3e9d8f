package graft.media

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import graft.sql.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media payload row: opaque binary + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary` with a media_type tag). */
final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])

/** Decoded/feature row produced by the per-partition media kernel.
  * `resized_w/h` = fit-within-224×224 aspect-preserving resize plan. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    resized_w: Int,
    resized_h: Int,
    n_frames: Int,
    sampled_frames: Int,
    content_fp: String)

/** PCM WAV payload row for the real audio-decode path (q178). */
final case class WavRow(doc_id: Long, wav: Array[Byte])

/** AVI payload row for the real video-demux path (q179). */
final case class VideoRow(doc_id: Long, avi: Array[Byte])

/** Features produced by the real video pipeline: container fields from the
  * demuxed AVI headers, pixel statistics from the REAL PNG codec's decode
  * of the sampled frames. */
final case class VideoFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    fps: Int,
    n_frames: Long,
    duration_ms: Long,
    sampled_frames: Int,
    pix_sum: Long,
    pix_peak: Long)

/** Features decoded from a WAV payload by the REAL JDK codec: container
  * format fields plus integer-exact signal statistics over the PCM
  * frames. */
final case class WavFeatures(
    doc_id: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_frames: Long,
    duration_ms: Long,
    peak_abs: Long,
    sum_sq: Long)

/** Multimodal-column processing (image/audio/video as opaque binary +
  * typed metadata).
  *
  * Pipeline shape is the one a production multimodal pipeline uses:
  * binary payloads travel as `BinaryType` rows; decode/feature-extract
  * runs batched per partition via a typed `mapPartitions` kernel (the
  * Scala analogue of `mapInPandas` — one iterator of rows per partition,
  * vectorizable, no per-row driver involvement, narrow: the 100 TB scan
  * never shuffles).
  *
  * The IMAGE codec is real: PNG/JPEG dimensions decode through the JDK's
  * `javax.imageio` (header-only — an `ImageReader` reads metadata, never
  * rasterizes, so the featurize pass stays I/O-bound at scale), driven in
  * `MediaKernelSpec` over the reference's golden-package images
  * (`ingester.py:407-418` copies them; the engine decodes them).
  *
  * The AUDIO codec is real too (round 11): PCM WAV decodes through the
  * JDK's `javax.sound.sampled.AudioSystem` (RIFF/WAVE container parse +
  * PCM frame stream — the same java.desktop module javax.imageio lives
  * in), exercised end-to-end by q178: deterministic PCM synthesis →
  * real WAV encode → real codec decode → integer-exact features, with
  * the oracle recomputing the features by pure arithmetic — only a
  * byte-faithful container round-trip through the codec can match.
  * The VIDEO pipeline is real as of q179 (round 11): gray frames encode
  * through the real PNG codec, mux into a real RIFF/AVI container
  * (Motion-PNG, fccHandler 'MPNG'), demux back with full structural
  * validation, and the sampled frames rasterize through `javax.imageio`
  * again — pixel-exact features, arithmetic oracle (PNG is lossless).
  * Only compressed codecs (mp3/ogg audio, H.264-class inter-frame video)
  * remain behind the deterministic 16-byte synthetic header stub — this
  * container ships no codecs for those. Every surrounding piece — binary
  * encode, schema, partition batching, feature columns — is real and
  * oracle-checked (q37).
  */
object MediaQueries {

  /** Header: magic "GRFT" + width + height + n_frames (big-endian ints). */
  private[media] val Magic = 0x47524654

  object MediaKernel {
    /** Synthetic-header decode (the audio/video stub and q37's oracle
      * regime): width, height, frame count from the 16-byte header. */
    def decodeStub(media: Array[Byte]): (Int, Int, Int) = {
      val bb = ByteBuffer.wrap(media)
      require(bb.getInt() == Magic, "not a graft media payload")
      (bb.getInt(), bb.getInt(), bb.getInt())
    }

    /** Real image decode: (width, height) via `javax.imageio`, header
      * metadata only (no pixel rasterization). None when no installed
      * reader recognizes the bytes. */
    def decodeImage(media: Array[Byte]): Option[(Int, Int)] = {
      // direct in-memory stream: the createImageInputStream default spools
      // through a temp FILE per call (useCache=true) — see AviKernel.readPng
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } finally iis.close()
    }

    /** Codec dispatch: (width, height, frames, header bytes to skip in the
      * content fingerprint). Synthetic payloads carry the GRFT magic;
      * anything else goes to the real image decoder. */
    private def decode(media: Array[Byte]): (Int, Int, Int, Int) =
      if (media.length >= 16 && ByteBuffer.wrap(media).getInt() == Magic) {
        val (w, h, f) = decodeStub(media)
        (w, h, f, 16)
      } else decodeImage(media) match {
        case Some((w, h)) => (w, h, 1, 0) // a still image is one frame
        case None => throw new IllegalArgumentException("undecodable media payload")
      }

    /** Batched per-partition featurize — the mapInPandas-shaped kernel.
      * The content fingerprint is md5 of the payload BODY (after the
      * synthetic header when present; whole bytes for a real image). */
    def featurize(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, frames, headerLen) = decode(r.media)
        md.reset()
        md.update(r.media, headerLen, r.media.length - headerLen)
        val fp = md.digest().map(b => f"$b%02x").mkString
        // resize plan: fit within 224×224 preserving aspect (never scale
        // up); the pixel resample itself is the codec's job
        val scale = math.min(1.0, math.min(224.0 / w, 224.0 / h))
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.media.length.toLong,
          width = w,
          height = h,
          resized_w = math.floor(w * scale).toInt,
          resized_h = math.floor(h * scale).toInt,
          n_frames = frames,
          sampled_frames = math.min(8, frames),
          content_fp = fp)
      }
    }
  }

  object WavKernel {
    /** Real audio decode: container format + PCM frames via
      * `javax.sound.sampled.AudioSystem`. Signal statistics are computed
      * from the decoded frame stream using the FORMAT'S OWN byte layout
      * (frame size, endianness), not assumptions about the input. */
    def decode(docId: Long, wav: Array[Byte]): WavFeatures = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      try {
        val f = in.getFormat
        require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16,
          s"q178 kernel handles 16-bit signed PCM, got $f")
        val pcm = in.readAllBytes()
        val sb = ByteBuffer.wrap(pcm)
          .order(if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                 else java.nio.ByteOrder.LITTLE_ENDIAN)
          .asShortBuffer()
        var peak = 0L
        var sumSq = 0L
        while (sb.hasRemaining) {
          val v = sb.get().toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumSq += v * v
        }
        val nFrames = (pcm.length / f.getFrameSize).toLong
        val sr = f.getSampleRate.toInt
        WavFeatures(docId, sr, f.getChannels, f.getSampleSizeInBits,
          nFrames, nFrames * 1000L / sr, peak, sumSq)
      } finally in.close()
    }

    /** Batched per-partition decode — the same mapInPandas-shaped kernel
      * contract as [[MediaKernel.featurize]]. */
    def featurize(rows: Iterator[WavRow]): Iterator[WavFeatures] =
      rows.map(r => decode(r.doc_id, r.wav))
  }

  object AviKernel {
    import java.nio.ByteOrder.LITTLE_ENDIAN

    private def fourcc(s: String): Int = {
      val b = s.getBytes(UTF_8)
      (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    }
    private val RIFF = fourcc("RIFF"); private val AVI  = fourcc("AVI ")
    private val LIST = fourcc("LIST"); private val Hdrl = fourcc("hdrl")
    private val Avih = fourcc("avih"); private val Strl = fourcc("strl")
    private val Strh = fourcc("strh"); private val Strf = fourcc("strf")
    private val Vids = fourcc("vids"); private val Mpng = fourcc("MPNG")
    private val Movi = fourcc("movi"); private val Dc00 = fourcc("00dc")
    private val Idx1 = fourcc("idx1")
    private val KeyframeFlag = 0x10 // AVIIF_KEYFRAME

    /** Demuxed container: header fields + the raw codec payload (one PNG
      * file per '00dc' chunk, Motion-PNG). The demuxer cross-checks every
      * redundant field the format carries — avih totals vs strh length vs
      * movi chunk count vs idx1 entries, idx1 offsets/sizes vs the actual
      * chunk positions, word alignment — so a structurally inconsistent
      * container is rejected here, before any codec work. */
    final case class Demuxed(
        width: Int, height: Int, fps: Int, nFrames: Int, frames: Vector[Array[Byte]])

    /** Mux gray-PNG frames into a REAL RIFF/AVI container (fccHandler
      * 'MPNG', the registered Motion-PNG FourCC): hdrl (avih + strl with
      * strh/strf), movi with one word-aligned '00dc' chunk per frame, and
      * a full idx1 keyframe index. Standard players recognize this layout;
      * [[demux]] re-derives every field from the bytes alone. */
    def mux(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val n = frames.size
      def chunkLen(b: Array[Byte]) = 8 + b.length + (b.length & 1)
      val moviData = 4 + frames.map(chunkLen).sum
      val hdrlData = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val idx1Data = 16 * n
      val riffData = 4 + (8 + hdrlData) + (8 + moviData) + (8 + idx1Data)
      val bb = ByteBuffer.allocate(8 + riffData).order(LITTLE_ENDIAN)
      bb.putInt(RIFF).putInt(riffData).putInt(AVI)
      // hdrl
      bb.putInt(LIST).putInt(hdrlData).putInt(Hdrl)
      bb.putInt(Avih).putInt(56)
      bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(KeyframeFlag) // µs/frame, maxBps, pad, AVIF_HASINDEX
      bb.putInt(n).putInt(0).putInt(1).putInt(0)                       // totalFrames, initial, streams, sugBuf
      bb.putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.putInt(LIST).putInt(4 + 64 + 48).putInt(Strl)
      bb.putInt(Strh).putInt(56)
      bb.putInt(Vids).putInt(Mpng).putInt(0).putInt(0).putInt(0)       // type, handler, flags, prio/lang, initial
      bb.putInt(1).putInt(fps).putInt(0).putInt(n)                     // scale, rate, start, length
      bb.putInt(0).putInt(0).putInt(0)                                 // sugBuf, quality, sampleSize
      bb.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
      bb.putInt(Strf).putInt(40)
      bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(8) // BITMAPINFOHEADER, planes, bpp
      bb.putInt(Mpng).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)  // biCompression='MPNG'
      // movi — record each chunk's offset (from the 'movi' fourcc) for idx1
      bb.putInt(LIST).putInt(moviData).putInt(Movi)
      val moviStart = bb.position() - 4
      val offsets = frames.map { f =>
        val off = bb.position() - moviStart
        bb.putInt(Dc00).putInt(f.length).put(f)
        if ((f.length & 1) == 1) bb.put(0.toByte)
        off
      }
      // idx1 — one keyframe entry per chunk
      bb.putInt(Idx1).putInt(idx1Data)
      frames.zip(offsets).foreach { case (f, off) =>
        bb.putInt(Dc00).putInt(KeyframeFlag).putInt(off).putInt(f.length)
      }
      bb.array()
    }

    /** Walk the RIFF tree and return header fields + frame payloads,
      * enforcing every structural invariant (see [[Demuxed]]). This is the
      * demux half a video pipeline owns; the codec half stays the JDK's. */
    def demux(avi: Array[Byte]): Demuxed = {
      val bb = ByteBuffer.wrap(avi).order(LITTLE_ENDIAN)
      require(bb.getInt() == RIFF, "not a RIFF container")
      val riffLen = bb.getInt()
      require(riffLen == avi.length - 8, s"RIFF size $riffLen != payload ${avi.length - 8}")
      require(bb.getInt() == AVI, "RIFF form is not 'AVI '")
      var width = -1; var height = -1; var fps = -1
      var avihFrames = -1; var strhFrames = -1
      var frames = Vector.empty[Array[Byte]]
      var chunkPos = Vector.empty[(Int, Int)] // (offset from movi fourcc, size)
      var idx = Vector.empty[(Int, Int)]
      while (bb.remaining() >= 8) {
        val id = bb.getInt(); val len = bb.getInt()
        val next = bb.position() + len + (len & 1)
        id match {
          case LIST =>
            val listType = bb.getInt()
            if (listType == Hdrl) {
              // avih
              require(bb.getInt() == Avih && bb.getInt() == 56, "hdrl must open with avih[56]")
              val usPerFrame = bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
              avihFrames = bb.getInt(); bb.getInt()
              require(bb.getInt() == 1, "expected exactly one stream"); bb.getInt()
              width = bb.getInt(); height = bb.getInt()
              bb.position(bb.position() + 16)
              // strl > strh + strf
              require(bb.getInt() == LIST, "avih must be followed by LIST strl")
              bb.getInt()
              require(bb.getInt() == Strl, "second hdrl list must be strl")
              require(bb.getInt() == Strh && bb.getInt() == 56, "strl must open with strh[56]")
              require(bb.getInt() == Vids, "stream type must be 'vids'")
              require(bb.getInt() == Mpng, "codec handler must be 'MPNG'")
              bb.position(bb.position() + 12)
              val scale = bb.getInt(); val rate = bb.getInt(); bb.getInt()
              strhFrames = bb.getInt()
              require(scale == 1, "strh scale must be 1")
              fps = rate
              require(usPerFrame == 1000000 / fps, "avih µs/frame disagrees with strh rate")
              bb.position(bb.position() + 20)
              require(bb.getInt() == Strf, "strh must be followed by strf")
              bb.getInt(); bb.getInt()
              require(bb.getInt() == width && bb.getInt() == height,
                "strf bitmap dims disagree with avih")
              bb.getShort(); bb.getShort()
              require(bb.getInt() == Mpng, "strf biCompression must be 'MPNG'")
            } else if (listType == Movi) {
              val moviStart = bb.position() - 4
              while (bb.position() < next) {
                val off = bb.position() - moviStart
                val cid = bb.getInt(); val clen = bb.getInt()
                require(cid == Dc00, "movi chunk is not a '00dc' frame")
                val payload = new Array[Byte](clen)
                bb.get(payload)
                if ((clen & 1) == 1) bb.get() // word-alignment pad
                frames :+= payload
                chunkPos :+= (off, clen)
              }
            }
          case Idx1 =>
            require(len % 16 == 0, "idx1 length not a multiple of 16")
            (0 until len / 16).foreach { _ =>
              require(bb.getInt() == Dc00, "idx1 entry id is not '00dc'")
              require(bb.getInt() == KeyframeFlag, "idx1 entry not flagged keyframe")
              idx :+= (bb.getInt(), bb.getInt())
            }
          case _ => // unknown top-level chunk: legal in RIFF, skip
        }
        bb.position(next)
      }
      require(width > 0 && fps > 0, "no hdrl headers found")
      require(avihFrames == strhFrames && strhFrames == frames.size,
        s"frame counts disagree: avih=$avihFrames strh=$strhFrames movi=${frames.size}")
      require(idx == chunkPos,
        "idx1 offsets/sizes disagree with actual movi chunk positions")
      Demuxed(width, height, fps, frames.size, frames)
    }

    /** Evenly-strided sample of `sampled` frame indices out of `n`
      * (j*n/sampled for j < sampled) — the frame-sampling schedule both
      * the kernel and the oracle use. */
    def sampleIndices(n: Int): Seq[Int] = {
      val sampled = math.min(8, n)
      (0 until sampled).map(j => j * n / sampled)
    }

    /** One PNG ImageReader per thread: `ImageIO.read` pays an SPI scan +
      * reader construction PER CALL, which dominates at 16×16 frame
      * sizes (measured: the convenience path made q179 the slowest bench
      * query; the cached reader leaves only actual codec work). Readers
      * are not thread-safe — ThreadLocal, not shared. */
    private val pngReader =
      ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
        javax.imageio.ImageIO.getImageReadersByFormatName("png").next())

    /** Decode one PNG via the cached per-thread reader (the REAL JDK
      * codec — only the per-call SPI dispatch is skipped). The input
      * stream is constructed directly as the in-memory kind:
      * `ImageIO.createImageInputStream` defaults to `useCache=true`,
      * which spools every frame through a temp FILE on disk — measured
      * as the dominant per-decode cost at 16×16 frame sizes. */
    def readPng(png: Array[Byte]): java.awt.image.BufferedImage = {
      val r = pngReader.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png))
      try {
        r.setInput(iis, true, true)
        r.read(0)
      } finally {
        r.setInput(null)
        iis.close()
      }
    }

    /** Demux + REAL codec decode: sampled frames go through the JDK's PNG
      * reader (`javax.imageio`, rasterized this time — pixels are the
      * payload here), and the gray samples fold into integer-exact
      * statistics. Decoded dimensions must agree with the container
      * headers — a codec/container mismatch is an error, not a feature. */
    def featurize(rows: Iterator[VideoRow]): Iterator[VideoFeatures] =
      rows.map { r =>
        val d = demux(r.avi)
        var pixSum = 0L
        var pixPeak = 0L
        sampleIndices(d.nFrames).foreach { i =>
          val img = readPng(d.frames(i))
          require(img != null, s"frame $i is not a decodable image")
          require(img.getWidth == d.width && img.getHeight == d.height,
            s"decoded frame $i is ${img.getWidth}x${img.getHeight}, container says ${d.width}x${d.height}")
          val raster = img.getRaster
          var y = 0
          while (y < d.height) {
            var x = 0
            while (x < d.width) {
              val v = raster.getSample(x, y, 0).toLong
              pixSum += v
              if (v > pixPeak) pixPeak = v
              x += 1
            }
            y += 1
          }
        }
        VideoFeatures(r.doc_id, d.width, d.height, d.fps, d.nFrames.toLong,
          d.nFrames * 1000L / d.fps, sampleIndices(d.nFrames).size, pixSum, pixPeak)
      }
  }

  /** Deterministic gray-frame synthesis + REAL PNG encode + REAL AVI mux
    * for a document: dims/fps/length derive from doc_id, each 8-bit pixel
    * from an integer hash of (x, y, frame, doc_id) — exactly recomputable
    * in SQL. PNG is lossless, so the oracle can verify the whole
    * container→codec→raster path by arithmetic. (Same hash family as
    * [[encodeWav]], same doc_id % 10⁸ mask — overflow-free for any id.) */
  /** Minimal spec-conformant PNG encoder (8-bit grayscale, filter 0,
    * one zlib IDAT) for FIXTURE synthesis only. `ImageIO`'s writer costs
    * ~0.6 ms per 16×16 frame (SPI dispatch + metadata machinery) and the
    * synth side isn't the product — at 100 TB the payloads already exist
    * in storage; here they're bench scaffolding. The DECODE path (the
    * product) still runs the real JDK codec, and because this emits
    * fully valid PNGs, that codec round-trips them losslessly —
    * `AviKernelSpec` pins decoded pixels == synthesis formula. */
  private def encodePngGray(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte]((w + 1) * h) // filter byte 0 per scanline
    var y = 0
    while (y < h) {
      System.arraycopy(pix, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    defl.setInput(raw); defl.finish()
    val zBuf = new Array[Byte](raw.length + 64)
    var zLen = 0
    while (!defl.finished()) zLen += defl.deflate(zBuf, zLen, zBuf.length - zLen)
    defl.end()
    val out = new java.io.ByteArrayOutputStream(zLen + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes(UTF_8)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", java.util.Arrays.copyOf(zBuf, zLen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private[media] def encodeAvi(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 3).toInt * 8
    val h = 16 + (docId % 2).toInt * 8
    val fps = 5 + (docId % 4).toInt
    val nFrames = 4 + (docId % 9).toInt
    val frames = (0 until nFrames).map { i =>
      val pix = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          pix(y * w + x) =
            (((x.toLong * 7 + y * 11 + i * 13 + (docId % 100000000L) * 31) * 2654435761L) % 256L).toByte
          x += 1
        }
        y += 1
      }
      encodePngGray(w, h, pix)
    }
    AviKernel.mux(w, h, fps, frames)
  }

  // ---------------------------------------------------------------- q179
  /** REAL video pipeline: synthesize gray frames → encode each through the
    * JDK's actual PNG codec → mux a real RIFF/AVI container (Motion-PNG)
    * → demux it back (full structural validation: header cross-checks,
    * idx1-vs-movi agreement, word alignment) → decode the sampled frames
    * through the PNG codec again → pixel-exact features. The oracle
    * recomputes everything by pure arithmetic from doc_id — a match
    * proves the mux, the demux, the codec round trip, and the frame
    * sampling schedule are all byte-faithful. Upgrades the video arm of
    * the multimodal family from synthetic-header stub to a real
    * container + real codec (only compressed inter-frame codecs like
    * H.264 remain out of reach — this container ships none).
    *
    * 100 TB shape: q37/q178's — payloads never shuffle, demux+decode is a
    * narrow partition-batched kernel, only fixed-width features leave the
    * executor; frame sampling bounds codec work per document regardless
    * of video length. */
  def q179VideoFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spreadIds(Tables(spark, dir).documents.select(col("doc_id")).as[Long])
      .map(id => VideoRow(id, encodeAvi(id)))
      .mapPartitions(AviKernel.featurize _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Codec kernels are CPU work, not scan work — and a gate-scale corpus
    * arrives as ONE parquet split, which runs the whole encode/demux
    * section single-threaded (the ingest fetchParallelism lesson, batch
    * form: measured 4.4 s → sub-second on q179 at sf0.1). Spread the
    * 8-byte id frame across the executors ONLY when the source's own
    * partitioning is below the machine's parallelism; a many-split
    * production scan pays no shuffle at all. */
  private def spreadIds(ds: org.apache.spark.sql.Dataset[Long]): org.apache.spark.sql.Dataset[Long] = {
    val cores = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < cores) ds.repartition(cores) else ds
  }

  val q179Sql: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
      |    CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
      |    CAST(5 + doc_id % 4 AS INT) AS fps,
      |    CAST(4 + doc_id % 9 AS INT) AS n_frames
      |  FROM documents),
      |s AS (SELECT *, CAST(least(8, n_frames) AS INT) AS sampled_frames FROM p),
      |fr AS (SELECT doc_id, width, height, fps, n_frames, sampled_frames,
      |    unnest(range(0, sampled_frames)) AS j FROM s),
      |fi AS (SELECT doc_id, width, height, fps, n_frames, sampled_frames,
      |    j * n_frames // sampled_frames AS i FROM fr),
      |fx AS (SELECT doc_id, width, height, fps, n_frames, sampled_frames, i,
      |    unnest(range(0, width)) AS x FROM fi),
      |px AS (SELECT doc_id, width, height, fps, n_frames, sampled_frames,
      |    ((x * 7 + y * 11 + i * 13 + (doc_id % 100000000) * 31) * 2654435761) % 256 AS v
      |  FROM fx, unnest(range(0, height)) AS t(y))
      |SELECT doc_id, width, height, fps,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(n_frames * 1000 // fps AS BIGINT) AS duration_ms,
      |  sampled_frames,
      |  CAST(sum(v) AS BIGINT) AS pix_sum,
      |  CAST(max(v) AS BIGINT) AS pix_peak
      |FROM px GROUP BY 1, 2, 3, 4, 5, 6, 7 ORDER BY doc_id""".stripMargin

  /** Deterministic PCM synthesis + REAL RIFF/WAVE encode for a document:
    * channels/rate/length derive from doc_id, each 16-bit sample from an
    * integer hash of (frame, channel, doc_id) — exactly recomputable in
    * SQL, so the oracle can verify the codec round trip by arithmetic.
    * (The multiplier is Knuth's 2654435761. The doc term is masked to
    * doc_id % 10⁸ BEFORE the multiply so the Int64 product can never
    * overflow for ANY doc_id — the 10× scale replica's k·10⁹ id offsets
    * overflowed the unmasked form, throwing in DuckDB while Spark wrapped
    * silently; the mask makes the bound structural instead of a comment.
    * The oracle SQL applies the identical mask.) */
  private[media] def encodeWav(docId: Long): Array[Byte] = {
    val ch = 1 + (docId % 2).toInt
    val sr = 8000 + 4000 * (docId % 3).toInt
    val nFrames = 400 + (docId % 800).toInt
    val data = ByteBuffer.allocate(nFrames * ch * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < ch) {
        val v = (((i.toLong * 31 + c * 17 + (docId % 100000000L) * 13) * 2654435761L) % 65536L).toInt - 32768
        data.putShort(v.toShort)
        c += 1
      }
      i += 1
    }
    val body = data.array()
    val w = ByteBuffer.allocate(44 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    w.put("RIFF".getBytes(UTF_8)).putInt(36 + body.length).put("WAVE".getBytes(UTF_8))
    w.put("fmt ".getBytes(UTF_8)).putInt(16).putShort(1).putShort(ch.toShort)
    w.putInt(sr).putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16)
    w.put("data".getBytes(UTF_8)).putInt(body.length).put(body)
    w.array()
  }

  // ---------------------------------------------------------------- q178
  /** REAL audio codec round trip: synthesize PCM → encode a real
    * RIFF/WAVE container → decode through the JDK's actual WAV codec
    * (`AudioSystem`) → integer-exact features (format fields, frame
    * count, duration, peak amplitude, signal energy). The oracle
    * recomputes every feature by pure arithmetic from doc_id — a match
    * proves the container encode, the codec's parse, and the PCM frame
    * walk are all byte-faithful (the q37 device, with a real codec in
    * the loop instead of the synthetic header).
    *
    * 100 TB shape: identical to q37 — binary payloads stay in the scan
    * stage, the decode kernel is a narrow partition-batched pass (I/O
    * bound, no shuffle), and only the fixed-width feature columns leave
    * the executor. */
  // no spreadIds here: q178's PCM kernel is ~0.3 s of CPU at gate scale —
  // measured, the repartition's extra stage costs more than the
  // parallelism buys (0.79 s → 1.68 s); q179's AVI kernel is 15× heavier
  // and flips the trade (4.4 s → 0.76 s)
  def q178AudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id")).as[Long]
      .map(id => WavRow(id, encodeWav(id)))
      .mapPartitions(WavKernel.featurize _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q178Sql: String =
    """WITH p AS (SELECT doc_id,
      |    CAST(1 + doc_id % 2 AS INT) AS channels,
      |    CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
      |    400 + doc_id % 800 AS n_frames
      |  FROM documents),
      |f1 AS (SELECT doc_id, channels, sample_rate, n_frames,
      |    unnest(range(0, n_frames)) AS i FROM p),
      |f2 AS (SELECT doc_id, channels, sample_rate, n_frames, i,
      |    unnest(range(0, channels)) AS c FROM f1),
      |sm AS (SELECT doc_id, channels, sample_rate, n_frames,
      |    ((i * 31 + c * 17 + (doc_id % 100000000) * 13) * 2654435761) % 65536 - 32768 AS s
      |  FROM f2)
      |SELECT doc_id, sample_rate, channels, CAST(16 AS INT) AS bits,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
      |  CAST(max(abs(s)) AS BIGINT) AS peak_abs,
      |  CAST(sum(s * s) AS BIGINT) AS sum_sq
      |FROM sm GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY doc_id""".stripMargin

  /** Build the synthetic media payload for a document: 16-byte header +
    * UTF-8 text body. Width/height/frames are deterministic functions of
    * doc_id so the oracle can recompute them without decoding. */
  private[media] def encode(docId: Long, text: String): Array[Byte] = {
    val body = text.getBytes(UTF_8)
    val bb = ByteBuffer.allocate(16 + body.length)
    bb.putInt(Magic)
    bb.putInt(64 + (docId % 512).toInt)
    bb.putInt(64 + (docId % 256).toInt)
    bb.putInt(1 + (docId % 24).toInt)
    bb.put(body)
    bb.array()
  }

  // ---------------------------------------------------------------- q37
  /** Binary encode → partition-batched decode/featurize → typed feature
    * columns. The oracle recomputes width/height/frames from doc_id and
    * the fingerprint/size from the text — only a byte-faithful binary
    * round-trip plus correct header parsing can match. */
  def q37MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, mt, encode(id, text))
      }
    media
      .mapPartitions(MediaKernel.featurize _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q37Sql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CAST(64 + doc_id % 512 AS INT) AS width,
      |    CAST(64 + doc_id % 256 AS INT) AS height
      |  FROM documents),
      |s AS (SELECT *, least(CAST(1.0 AS DOUBLE),
      |        least(CAST(224.0 AS DOUBLE) / width, CAST(224.0 AS DOUBLE) / height)) AS scale
      |      FROM m)
      |SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) + 16 AS n_bytes,
      |  width, height,
      |  CAST(floor(width * scale) AS INT) AS resized_w,
      |  CAST(floor(height * scale) AS INT) AS resized_h,
      |  CAST(1 + doc_id % 24 AS INT) AS n_frames,
      |  CAST(least(8, 1 + doc_id % 24) AS INT) AS sampled_frames,
      |  md5(text) AS content_fp
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Frame sampling: video payloads explode to one row per sampled frame
    * with REAL byte accounting — each frame is a [[FrameBytes]]-byte slice
    * of the payload body, offsets/lengths computed in the kernel from the
    * actual binary and verified by the oracle's octet_length arithmetic.
    * The frame "decode" (pixels) stays stubbed like q37's codec; the
    * Spark-side plumbing (binary rows → per-partition slicing → explode)
    * is the real multimodal shape. */
  private val FrameBytes = 97

  final case class FrameRow(
      doc_id: Long, frame_idx: Int, frame_off: Long, frame_len: Long, frame_tag: String)

  def q43MediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 2) // the "video" rows of q37's cycle
      .as[(Long, String)]
      .map { case (id, text) => MediaRow(id, "video", encode(id, text)) }
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val (_, _, frames) = MediaKernel.decodeStub(r.media)
        val sampled = math.min(8, frames)
        val bodyLen = r.media.length - 16
        (0 until sampled).iterator.map { i =>
          val off = i.toLong * FrameBytes
          val len = math.max(0L, math.min(FrameBytes.toLong, bodyLen - off))
          md.reset()
          val tag = md.digest(s"${r.doc_id}:$i".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          FrameRow(r.doc_id, i, off, len, tag)
        }
      }
    }.toDF().orderBy(col("doc_id"), col("frame_idx"))
  }

  val q43Sql: String =
    s"""SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |  i * $FrameBytes AS frame_off,
       |  greatest(0, least($FrameBytes, octet_length(encode(text)) - i * $FrameBytes)) AS frame_len,
       |  md5(doc_id || ':' || i) AS frame_tag
       |FROM documents, unnest(range(least(8, 1 + doc_id % 24))) AS t(i)
       |WHERE doc_id % 3 = 2
       |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_features" -> (q37MediaFeatures _),
    "q43_media_frames"   -> (q43MediaFrames _),
    "q178_audio_features" -> (q178AudioFeatures _),
    "q179_video_features" -> (q179VideoFeatures _))

  val oracleSql: Map[String, String] = Map(
    "q37_media_features" -> q37Sql,
    "q43_media_frames"   -> q43Sql,
    "q178_audio_features" -> q178Sql,
    "q179_video_features" -> q179Sql)
}
