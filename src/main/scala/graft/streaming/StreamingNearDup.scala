package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incoming raw document (streaming near-dup input). */
final case class StreamText(doc_id: Long, text: String)

/** A banded LSH candidate hit: `doc_id` collided with the earlier
  * `dup_of` in LSH band `band`, with the signature-estimated Jaccard.
  * A pair sharing several bands emits once per band (at-least-once per
  * pair — consumers dedupe on (doc_id, dup_of); collapsing in-stream
  * would cost a second stateful shuffle for no semantic gain). */
final case class NearDupHit(doc_id: Long, dup_of: Long, band: Int, est_jaccard: Double)

/** Streaming MinHash-LSH near-duplicate detection — q21's batch banding
  * as a continuous operator: each arriving document's 96-hash MinHash
  * signature is banded 32×3 exactly like the batch pipeline
  * ([[graft.dedup.DedupQueries]]; `StreamingNearDupSpec` pins the
  * (band, sig) keys BIT-IDENTICAL to the batch `lshBuckets` output), and
  * keyed state per (band, sig) bucket holds the signatures of up to
  * [[StreamingNearDup.BucketCap]] earlier documents. A new arrival
  * estimates Jaccard against each stored signature as the fraction of
  * agreeing MinHash components (the unbiased MinHash estimator) and
  * emits a [[NearDupHit]] for every one at or above the threshold.
  *
  * Scale shape: state is keyed by the SAME (band, sig) the batch join
  * shuffles on — hot buckets shard across the state store like any
  * skewed key; per key the state is ≤ [[StreamingNearDup.BucketCap]]
  * 96-long signatures (≤ ~6 KB), so total state is bucket-count bounded,
  * never corpus bounded. Documents themselves never enter state; the
  * signature is computed in the stateless projection. The cap is the
  * bounded-state trade (an evicted representative can miss a late dup);
  * the deployment swap for stricter recall windows is the
  * [[StreamingDedup.firstSeenWithTtl]] deadline pattern on each entry. */
object StreamingNearDup {

  import graft.text.TextOps.{minhashCoeff, MinHashPrime}

  /** Identical to the batch constants (NumHashes = 96, 32 bands × 3). */
  private[streaming] val NumHashes = 96
  private[streaming] val BandRows = 3
  /** Signatures kept per (band, sig) bucket; oldest evicted first. */
  val BucketCap = 8
  /** Default emission threshold on the estimated Jaccard. */
  val DefaultThreshold = 0.5

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The 96-component MinHash signature of a text, arithmetic-identical
    * to the batch pipeline: distinct 3-shingles → 60-bit md5 hash → base
    * hash (top 32 bits mod p) → affine Carter–Wegman family → min.
    * Empty for texts with fewer than 3 tokens (no shingles). */
  def signature(text: String): Array[Long] = {
    val toks = text.toLowerCase.trim.split("[ \\t\\n\\r\\f\\u000B]+")
    if (toks.length < 3) return Array.emptyLongArray
    val bhs = toks.sliding(3).map(_.mkString(" ")).toSet[String].map { sh =>
      val h = java.lang.Long.parseLong(md5hex(sh).substring(0, 15), 16)
      (h >> 28) % MinHashPrime
    }
    Array.tabulate(NumHashes) { i =>
      val a = minhashCoeff("a", i); val b = minhashCoeff("b", i)
      bhs.map(bh => (bh * a + b) % MinHashPrime).min
    }
  }

  /** Band keys of a signature: (band index, md5 of the comma-joined band
    * rows) — the exact batch `lshBuckets` sig encoding. */
  def bandKeys(sig: Array[Long]): Seq[(Int, String)] =
    (0 until NumHashes / BandRows).map { b =>
      b -> md5hex((0 until BandRows).map(r => sig(b * BandRows + r)).mkString(","))
    }

  /** Estimated Jaccard = fraction of agreeing signature components. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < NumHashes) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / NumHashes
  }

  /** One bucket arrival (internal shuffle row). */
  final case class BucketArrival(bucket: String, band: Int, doc_id: Long, sig: Array[Long])

  /** The per-bucket state transition, factored out so the spec can drive
    * it through `TestGroupState`: arrivals (processed in doc_id order for
    * within-batch determinism) first score against every stored
    * signature, then enter the bucket themselves (FIFO-capped). */
  def bucketHandler(threshold: Double)(
      bucket: String, batch: Iterator[BucketArrival],
      state: GroupState[List[(Long, Array[Long])]]): Iterator[NearDupHit] = {
    var held = state.getOption.getOrElse(Nil)
    val hits = List.newBuilder[NearDupHit]
    batch.toSeq.sortBy(_.doc_id).foreach { a =>
      held.foreach { case (oldId, oldSig) =>
        if (oldId != a.doc_id) {
          val j = estJaccard(a.sig, oldSig)
          if (j >= threshold) hits += NearDupHit(a.doc_id, oldId, a.band, j)
        }
      }
      // A replayed/duplicate doc_id refreshes its slot instead of taking a
      // second one — otherwise redelivery consumes FIFO cap slots and
      // evicts distinct representatives, degrading recall.
      held = (held.filterNot(_._1 == a.doc_id) :+ (a.doc_id -> a.sig)).takeRight(BucketCap)
    }
    state.update(held)
    hits.result().iterator
  }

  /** Wire the operator over a stream of raw documents. */
  def detect(docs: Dataset[StreamText],
      threshold: Double = DefaultThreshold): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap { d =>
        val sig = signature(d.text)
        if (sig.isEmpty) Iterator.empty
        else bandKeys(sig).iterator.map { case (b, s) =>
          BucketArrival(s"$b:$s", b, d.doc_id, sig)
        }
      }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(bucketHandler(threshold))
  }
}
