package graft.media

import java.nio.file.{Files, Paths}

import graft.tar.TarOps
import org.scalatest.funsuite.AnyFunSuite

/** Drives the REAL image codec (`javax.imageio`, header-only) over the
  * reference's golden-package images — the PNG and JPEG the reference's
  * asset pass copies (`ingester.py:407-418`) — plus the codec dispatch
  * and the featurize kernel's resize/fingerprint arithmetic. Pure JVM
  * kernel, no SparkSession needed. */
class MediaKernelSpec extends AnyFunSuite {

  private val fixtures = Paths.get("/root/reference/aws_examples/s3/te-editorial-out-int")

  private def goldenImages(): Map[String, Array[Byte]] = {
    val archive = Files.readAllBytes(fixtures.resolve("TDR-2022-DNWR.tar.gz"))
    TarOps.explode(archive)
      .filter(m => m.name.endsWith(".png") || m.name.endsWith(".jpg"))
      .map(m => m.name.split('/').last -> m.bytes).toMap
      .filter(!_._1.startsWith("._")) // macOS AppleDouble sidecars, not images
  }

  test("golden PNG and JPEG decode to positive dimensions via javax.imageio") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val imgs = goldenImages()
    assert(imgs.keySet == Set("image1.png", "R-1456368-1295322787.jpeg.jpg"))
    for ((name, bytes) <- imgs) {
      val dims = MediaQueries.MediaKernel.decodeImage(bytes)
      assert(dims.isDefined, s"$name failed to decode")
      val (w, h) = dims.get
      assert(w > 0 && h > 0, s"$name: non-positive dimensions ($w, $h)")
    }
  }

  test("featurize routes real images through the image codec: 1 frame, whole-byte fingerprint, resize plan") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val imgs = goldenImages()
    val rows = imgs.toSeq.sortBy(_._1).zipWithIndex.map { case ((_, bytes), i) =>
      MediaRow(i.toLong, "image", bytes)
    }
    val feats = MediaQueries.MediaKernel.featurize(rows.iterator).toSeq
    assert(feats.length == 2)
    for ((f, r) <- feats.zip(rows)) {
      val (w, h) = MediaQueries.MediaKernel.decodeImage(r.media).get
      assert((f.width, f.height) == (w, h))
      assert(f.n_frames == 1 && f.sampled_frames == 1)
      assert(f.n_bytes == r.media.length.toLong)
      // a real image fingerprints its WHOLE bytes (no synthetic header)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(r.media).map(b => f"$b%02x").mkString
      assert(f.content_fp == md5)
      // fit-within-224 preserving aspect, never scaled up
      val scale = math.min(1.0, math.min(224.0 / w, 224.0 / h))
      assert(f.resized_w == math.floor(w * scale).toInt)
      assert(f.resized_h == math.floor(h * scale).toInt)
      assert(f.resized_w <= 224 && f.resized_h <= 224)
    }
  }

  test("undecodable and degenerate payloads fail loudly, not silently") {
    // unrecognized bytes: no reader claims them → dispatch throws
    val junk = Array.fill[Byte](64)(0x5a)
    assert(MediaQueries.MediaKernel.decodeImage(junk).isEmpty)
    intercept[IllegalArgumentException] {
      MediaQueries.MediaKernel.featurize(
        Iterator(MediaRow(0L, "image", junk))).toSeq
    }
    // empty payload must not NPE through the null-stream path
    assert(MediaQueries.MediaKernel.decodeImage(Array.emptyByteArray).isEmpty)
  }
}
