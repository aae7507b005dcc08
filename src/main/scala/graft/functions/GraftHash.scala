package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels called from generated code (whole-stage codegen
  * emits direct static calls — no boxing, no UDF serialization).
  * Reference behavior: document fingerprinting / near-dup hashing for
  * training-data pipelines; the FNV/simhash constants are the standard
  * public ones.
  */
object GraftHash {

  /** FNV-1a 64-bit over the UTF-8 bytes of `s`. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private final val P = 1000000007L

  /** Positional polynomial fingerprint over whitespace-split words.
    *
    * Deliberately SQL-portable (bit-exact DuckDB oracle):
    *   word_val(w) = length(w)*1000003 + code(first)*31 + code(last)
    *   fp = sum_i( word_val(w_i) * ((i*131) mod P) ) mod P, i 1-based,
    * empty words (runs of spaces) skipped. All intermediates fit i64.
    */
  def polyFingerprint(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    var wordIdx = 0
    val n = str.length
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && str.charAt(i) != ' ') i += 1
        wordIdx += 1
        val len = i - start
        val first = str.codePointAt(start)
        val last = str.codePointBefore(i)
        val wordVal = len.toLong * 1000003L + first.toLong * 31L + last.toLong
        acc = (acc + wordVal * ((wordIdx.toLong * 131L) % P)) % P
      }
    }
    acc
  }

  /** 64-bit SimHash over FNV-1a word hashes (whitespace tokens). */
  def simhash64(s: UTF8String): Long = {
    val str = s.toString
    val acc = new Array[Int](64)
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && str.charAt(i) != ' ') i += 1
        val h = fnv64(UTF8String.fromString(str.substring(start, i)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
