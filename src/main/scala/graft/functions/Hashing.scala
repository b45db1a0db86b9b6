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

  /** 16-bit SimHash over a token array: bit j set iff the sum over tokens of
    * (2*bit_j(h)-1) is positive.
    * NOTE: evaluates the md5 hash array once per BIT reference — callers on
    * hot paths should materialize the hash array in a column and use
    * [[simhash16FromHashes]] (16x md5 reduction). */
  def simhash16(tokens: Column): Column =
    simhash16FromHashes(transform(tokens, t => portableHash32(t)))

  /** SimHash over a pre-computed (ideally column-materialized) hash array. */
  def simhash16FromHashes(hashes: Column): Column =
    (0 until 16).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Rolling polynomial fingerprint over tokens:
    * acc = (acc*31 + portableHash32(token)) mod 2^31 — a document
    * fingerprint stable across engines. */
  def fingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * 31L + portableHash32(t)) % 2147483648L)
}
