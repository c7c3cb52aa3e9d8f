package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** The cross-engine 60-bit hash contract shared by the expression kernels
  * ([[WordShingles]], [[WinnowMinima]]): first 60 bits of md5, identical
  * to `TextOps.hex60` / DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  * ONE definition — the oracle-parity guarantee every caller's scaladoc
  * cites must not be maintained in per-expression copies. */
private[expr] object ExprHash {

  /** First 60 bits of md5(s) as a non-negative Long. `md` is the caller's
    * reusable (reset-per-call) digest instance — one allocation per row,
    * not per value. */
  def hex60(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val dig = md.digest(s.getBytes)
    val u64 =
      ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    u64 >>> 4
  }
}
