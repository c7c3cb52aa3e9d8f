package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared text primitives for the training-data pipeline operators.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so whole-stage codegen spans the full text pipeline, and every
  * construct has an exact DuckDB equivalent for the oracle:
  *
  *   - `normText`   ⇔ `lower(trim(regexp_replace(text, WsSql+'+', ' ', 'g')))`
  *   - `hex60`      ⇔ `('0x' || substr(md5(x),1,15))::BIGINT`
  *   - `shingles`   ⇔ `[t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1,len(t)-1)]`
  *
  * md5 is the cross-engine hash: identical bytes-in/hex-out in Spark and
  * DuckDB, unlike `hash`/`xxhash64` whose seeds differ per engine. The
  * 15-hex-char prefix (60 bits) keeps the value in a signed Long / BIGINT.
  *
  * Whitespace is an EXPLICIT class, not `\s`: Java regex `\s` includes
  * `\x0B` (vertical tab) while DuckDB's RE2 `\s` does not — one stray
  * vertical tab in a document would silently break every hash compare.
  * Both engines get the same five-char class.
  */
object TextOps {

  /** The whitespace characters (for embedding in other classes). */
  val WsChars: String = " \\t\\n\\r\\f\\x0B"

  /** The shared whitespace class (Java regex side). */
  val Ws: String = "[ \\t\\n\\r\\f\\x0B]"

  /** The same class for DuckDB RE2 (literal backslashes in SQL text). */
  val WsSql: String = "[ \\t\\n\\r\\f\\x0B]"

  /** Complement class, both engines. */
  val NotWs: String = "[^ \\t\\n\\r\\f\\x0B]"
  val NotWsSql: String = "[^ \\t\\n\\r\\f\\x0B]"

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, s"$Ws+", " ")))

  /** Whitespace-token count of RAW text — THE token definition (q15/q59/
    * q62 and the oracle all share this one spelling; the explicit
    * whitespace class is load-bearing, see the scaladoc above). */
  def nTokens(c: Column): Column = regexp_count(c, lit(NotWs + "+"))

  /** The same count as a DuckDB expression over a column/expr string. */
  def nTokensSql(expr: String): String =
    s"len(regexp_extract_all($expr, '$NotWsSql+'))"

  /** Tokens of normalized text (single-space split). */
  def tokens(norm: Column): Column = split(norm, " ")

  /** First 60 bits of md5 as a Long — the cross-engine integer hash. */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded 60-bit hash family: h_i(x) = hex60(i || ':' || x). One md5 per
    * (seed, value) — use [[minhashFamily]] when many seeds are needed. */
  def hex60Seeded(seed: Int, c: Column): Column =
    hex60(concat(lit(s"$seed:"), c))

  // ---- affine MinHash family (one md5 total, then integer arithmetic) ----

  /** Carter–Wegman prime (also used by Spark MLlib's MinHashLSH). */
  val MinHashPrime: Long = 2038074743L

  /** 32-bit md5 prefix reduced mod the prime — the ONE per-value hash the
    * whole affine family is derived from. */
  def hex32Mod(c: Column): Column =
    (conv(substring(md5(c), 1, 8), 16, 10).cast(LongType) % MinHashPrime)

  /** Deterministic family coefficients: a_i ∈ [1, p-1], b_i ∈ [0, p-1]
    * from md5 of the seed index (driver-side, plan-time constants). */
  def minhashCoeff(kind: String, i: Int): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$kind:$i".getBytes("UTF-8"))
    val v = ((dig(0) & 0x7fL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
    if (kind == "a") 1L + (v % (MinHashPrime - 1)) else v % MinHashPrime
  }

  /** h_i(x) = (a_i·h + b_i) mod p over the shared base hash `h` (< p).
    * a_i < p < 2^31 and h < p < 2^31, so the product stays well inside a
    * signed 64-bit long — overflow-free in both ANSI Spark and DuckDB.
    * This is the standard affine min-wise family (cf. Spark MLlib
    * MinHashLSH): 1 md5 per shingle instead of one per (seed, shingle). */
  def minhashFamily(numHashes: Int, baseHash: Column): Seq[Column] =
    (0 until numHashes).map { i =>
      (baseHash * lit(minhashCoeff("a", i)) + lit(minhashCoeff("b", i))) % MinHashPrime
    }

  /** Distinct word k-shingles of a token array (k consecutive tokens
    * joined by a single space; fewer than k tokens → empty; first-
    * occurrence order like DuckDB `list_distinct`). One codegen'd pass —
    * see [[graft.expr.WordShingles]] for why the HOF formulation
    * (`array_distinct(transform(sequence…))`) was the bench bottleneck. */
  def shingles(toks: Column, k: Int = 3): Column =
    graft.expr.WordShingles.of(toks, k)

  /** Distinct word k-shingles pre-hashed to hex60 longs in the same
    * kernel pass (≡ `transform(shingles(toks), hex60)`). */
  def shingleHashes(toks: Column, k: Int = 3): Column =
    graft.expr.WordShingles.hashedOf(toks, k)
}
