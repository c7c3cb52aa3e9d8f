package graft.media

import graft.SparkSpec
import graft.media.MediaQueries.AviKernel

/** q179's video path is REAL: the muxed bytes are a structurally valid
  * RIFF/AVI (every redundant header field cross-checked by the demuxer),
  * the PNG codec is genuinely in the loop (tampered frame bytes fail in
  * `javax.imageio`, not our code), and PNG losslessness means decoded
  * pixels re-derive exactly from the synthesis formula. */
class AviKernelSpec extends SparkSpec {

  private def pixel(x: Int, y: Int, i: Int, docId: Long): Long =
    ((x.toLong * 7 + y * 11 + i * 13 + docId * 31) * 2654435761L) % 256L

  test("mux -> demux round trip recovers headers, frame count, and payloads") {
    for (docId <- Seq(0L, 1L, 2L, 5L, 11L, 97L)) {
      val d = AviKernel.demux(MediaQueries.encodeAvi(docId))
      assert(d.width == 16 + (docId % 3).toInt * 8)
      assert(d.height == 16 + (docId % 2).toInt * 8)
      assert(d.fps == 5 + (docId % 4).toInt)
      assert(d.nFrames == 4 + (docId % 9).toInt)
      assert(d.frames.size == d.nFrames)
      // every frame payload is a standalone PNG file
      d.frames.foreach { f =>
        assert(f.length > 8 && (f(1) & 0xff) == 'P' && (f(2) & 0xff) == 'N')
      }
    }
  }

  test("PNG is lossless: decoded pixels equal the synthesis formula exactly") {
    val docId = 5L
    val d = AviKernel.demux(MediaQueries.encodeAvi(docId))
    d.frames.zipWithIndex.foreach { case (png, i) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == d.width && img.getHeight == d.height)
      for (y <- 0 until d.height; x <- 0 until d.width)
        assert(img.getRaster.getSample(x, y, 0) == pixel(x, y, i, docId),
          s"frame $i pixel ($x,$y)")
    }
  }

  test("featurize matches a driver-side re-derivation over the sampled frames") {
    for (docId <- Seq(0L, 3L, 8L, 42L)) {
      val f = AviKernel.featurize(Iterator(VideoRow(docId, MediaQueries.encodeAvi(docId)))).next()
      val n = 4 + (docId % 9).toInt
      assert(f.n_frames == n && f.sampled_frames == math.min(8, n))
      assert(f.duration_ms == n * 1000L / f.fps)
      val vals = for {
        i <- AviKernel.sampleIndices(n)
        y <- 0 until f.height
        x <- 0 until f.width
      } yield pixel(x, y, i, docId)
      assert(f.pix_sum == vals.sum, s"doc $docId pix_sum")
      assert(f.pix_peak == vals.max, s"doc $docId pix_peak")
    }
  }

  test("structural tampering is rejected by the demuxer's cross-checks") {
    val avi = MediaQueries.encodeAvi(7L)
    // break the RIFF magic
    val badMagic = avi.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](AviKernel.demux(badMagic))
    // truncate: RIFF size no longer matches the payload
    intercept[IllegalArgumentException](AviKernel.demux(avi.take(avi.length - 16)))
    // corrupt the idx1 size field of the last entry (last 4 bytes):
    // offsets/sizes must agree with actual movi chunk positions
    val badIdx = avi.clone()
    badIdx(avi.length - 4) = (badIdx(avi.length - 4) ^ 0x01).toByte
    intercept[IllegalArgumentException](AviKernel.demux(badIdx))
  }

  test("the real PNG codec is in the loop: a tampered frame body fails to decode or mismatches") {
    val avi = MediaQueries.encodeAvi(7L)
    val d = AviKernel.demux(avi)
    // flip a byte in the middle of the first frame's PNG payload (its IDAT
    // zlib stream) — only a real inflate/CRC pass can notice
    val png = d.frames.head.clone()
    png(png.length / 2) = (png(png.length / 2) ^ 0x40).toByte
    val failedOrWrong =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        img == null || {
          val ok = for (y <- 0 until d.height; x <- 0 until d.width)
            yield img.getRaster.getSample(x, y, 0).toLong == pixel(x, y, 0, 7L)
          ok.contains(false)
        }
      } catch { case _: Exception => true }
    assert(failedOrWrong, "tampered PNG decoded to identical pixels — codec not in the loop")
  }
}
