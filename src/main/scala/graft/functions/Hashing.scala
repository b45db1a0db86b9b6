package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing primitives for dedup / fingerprinting.
  *
  * Everything here is reproducible in any engine with md5 + integer
  * arithmetic (the DuckDB oracles replay these formulas exactly), unlike
  * Spark's murmur3 `hash()` — determinism across engines is a feature for
  * cross-system dedup pipelines, and it is what lets the correctness gate
  * verify sketches hash-for-hash.
  *
  * Scale: all pure Column expressions (codegen'd, no UDFs); cost is one md5
  * per token/shingle, embarrassingly parallel.
  */
object Hashing {

  /** 32-bit portable hash: first 8 hex chars of md5 as a long in [0, 2^32).
    * DuckDB replica: `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles from a token array, in order.
    * DuckDB replica: list_transform(range(1, len(t)-n+2), i ->
    *   array_to_string(t[i:i+n-1], ' ')). */
  def shingles(tokens: Column, n: Int): Column =
    // guard: sequence(1, x<1) would generate a DESCENDING sequence in Spark
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))

  /** MinHash signature (k permutations) over a shingle array.
    * Permutation i: min over shingles of (A_i * h + B_i) mod P, with
    * A_i < 2^30 so A*h stays inside int64 in every engine.
    * Empty shingle sets -> P (sentinel, never produced by a real hash). */
  val MinhashP: Long = 4294967311L // prime > 2^32
  def minhashA(i: Int): Long = (2L * i + 1) * 1000003L % (1L << 30)
  def minhashB(i: Int): Long = (i * 777767777L + 12345L) % MinhashP

  def minhashSig(shingleCol: Column, k: Int): Column = {
    val hashes = transform(shingleCol, s => portableHash32(s))
    val mins = (0 until k).map { i =>
      coalesce(
        array_min(transform(hashes,
          h => (h * minhashA(i) + minhashB(i)) % MinhashP)),
        lit(MinhashP))
    }
    array(mins: _*)
  }

  /** Word `w` (0 or 1) of the md5 digest as a 32-bit unsigned value in a
    * long: hex chars [1+8w, 8+8w]. DuckDB replica:
    * `('0x' || substr(md5(s), 1+8w, 8))::BIGINT`. */
  def md5Word32(digestHex: Column, w: Int): Column =
    conv(substring(digestHex, 1 + 8 * w, 8), 16, 10).cast("long")

  /** 64-bit SimHash over a token array: bit j set iff the sum over tokens of
    * (2*bit_j(h)-1) is positive, where bits 0-31 come from md5 word 0 and
    * bits 32-63 from md5 word 1. Evaluated by the one-pass codegen'd
    * [[Simhash64Expr]] (one md5 per token, primitive vote array); the
    * Column-formula [[simhash64FromHashes]] below defines the same value
    * declaratively and is what the DuckDB oracles replay. */
  def simhash64(tokens: Column): Column = Simhash64Expr.simhash64(tokens)

  /** Reference Column formula for the 64-bit SimHash, over 32-bit hash-word
    * arrays: `lo` votes bits 0-31, `hi` votes bits 32-63. Bit 63's weight is
    * Long.MinValue — the sum stays in signed-64 range because bits 0-62 sum
    * to at most 2^63-1 (two's complement, identical in DuckDB BIGINT).
    * Null hash entries (from null tokens) are skipped, matching the one-pass
    * [[Simhash64Expr]], which skips null tokens — without the filter a
    * single null would null the whole vote fold and zero the sketch.
    * 64 interpreted folds — use [[simhash64]] on hot paths; a unit test pins
    * the two forms equal. */
  def simhash64FromHashes(lo: Column, hi: Column): Column =
    (0 until 64).map { j =>
      val (hashes, bit) = if (j < 32) (lo, j) else (hi, j - 32)
      val vote = aggregate(filter(hashes, h => h.isNotNull), lit(0L),
        (acc, h) => acc + (shiftright(h, bit) % 2) * 2 - 1)
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Rolling polynomial fingerprint over tokens:
    * acc = (acc*31 + portableHash32(token)) mod 2^31 — a document
    * fingerprint stable across engines. */
  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * 31L + portableHash32(t)) % 2147483648L)
}
