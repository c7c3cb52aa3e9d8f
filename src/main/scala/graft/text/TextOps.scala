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
  *   - `normText`   ⇔ `lower(trim(regexp_replace(text,'\s+',' ','g')))`
  *   - `hex60`      ⇔ `('0x' || substr(md5(x),1,15))::BIGINT`
  *   - `shingles`   ⇔ `[t[i]||' '||t[i+1]||' '||t[i+2] for i in range(1,len(t)-1)]`
  *
  * md5 is the cross-engine hash: identical bytes-in/hex-out in Spark and
  * DuckDB, unlike `hash`/`xxhash64` whose seeds differ per engine. The
  * 15-hex-char prefix (60 bits) keeps the value in a signed Long / BIGINT.
  */
object TextOps {

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Tokens of normalized text (single-space split). */
  def tokens(norm: Column): Column = split(norm, " ")

  /** First 60 bits of md5 as a Long — the cross-engine integer hash. */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded 60-bit hash family: h_i(x) = hex60(i || ':' || x). */
  def hex60Seeded(seed: Int, c: Column): Column =
    hex60(concat(lit(s"$seed:"), c))

  /** Distinct word k-shingles of a token array (k consecutive tokens joined
    * by a single space). Empty array when there are fewer than k tokens
    * (sequence() would count backwards on a negative stop — guard it). */
  def shingles(toks: Column, k: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= k, grams).otherwise(array()))
  }
}
