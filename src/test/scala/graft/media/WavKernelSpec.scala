package graft.media

import graft.SparkSpec

/** q178's codec path is REAL: the JDK WAV reader is actually in the
  * loop (corrupt containers are rejected by the codec, not by our
  * code), the decoded format fields come from the container, and the
  * signal statistics re-derive from the synthesis formula. */
class WavKernelSpec extends SparkSpec {

  private def sample(i: Long, c: Int, docId: Long): Long =
    ((i * 31 + c * 17 + docId * 13) * 2654435761L) % 65536L - 32768L

  test("decode returns the container's own format fields and exact signal stats") {
    for (docId <- Seq(0L, 1L, 2L, 5L, 97L)) {
      val f = MediaQueries.WavKernel.decode(docId, MediaQueries.encodeWav(docId))
      assert(f.channels == 1 + (docId % 2).toInt)
      assert(f.sample_rate == 8000 + 4000 * (docId % 3).toInt)
      assert(f.bits == 16)
      val nFrames = 400 + (docId % 800)
      assert(f.n_frames == nFrames)
      assert(f.duration_ms == nFrames * 1000 / f.sample_rate)
      val samples = for {
        i <- 0L until nFrames
        c <- 0 until f.channels
      } yield sample(i, c, docId)
      assert(f.peak_abs == samples.map(math.abs).max, s"doc $docId peak")
      assert(f.sum_sq == samples.map(v => v * v).sum, s"doc $docId energy")
    }
  }

  test("the real codec is in the loop: corrupt containers are rejected by AudioSystem") {
    val wav = MediaQueries.encodeWav(7L)
    // destroy the RIFF magic — our code never inspects it; only the JDK
    // codec can notice
    val corrupt = wav.clone()
    corrupt(0) = 'X'.toByte
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      MediaQueries.WavKernel.decode(7L, corrupt)
    }
    // truncated mid-header: also the codec's rejection
    intercept[Exception] {
      MediaQueries.WavKernel.decode(7L, wav.take(20))
    }
  }
}
