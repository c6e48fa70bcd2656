package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The correctness gate hash-compares Spark results against DuckDB, so
  * every hash-dependent operator (fingerprints, MinHash, SimHash, LSH
  * banding) must produce *identical integers* in both engines. Neither
  * engine's native `hash()` matches the other (Spark = Murmur3,
  * DuckDB = its own), but both expose md5-as-hex, and both can parse a
  * 14-hex-digit prefix into a BIGINT:
  *
  *   Spark : conv(substr(md5(x), 1, 14), 16, 10)  cast to long
  *   DuckDB: ('0x' || substr(md5(x), 1, 14))::BIGINT
  *
  * 14 hex digits = 56 bits — always positive, no BIGINT overflow, and
  * plenty of entropy for sketching. All downstream sketch math
  * (MinHash permutations, SimHash bit sums) stays in pure 64-bit
  * integer arithmetic, which the two engines evaluate identically.
  *
  * At 100 TB scale md5 is not the cheapest hash (xxhash64 would be
  * ~5× faster) — the portable choice is deliberate for oracle
  * verifiability; swapping `sparkHash56` for `xxhash64` is a one-line
  * production change that preserves every operator's structure.
  */
object PortableHash {
  /** 56-bit portable hash of a string column (Spark side): the native
    * codegen expression [[graft.functions.Hash56]] — bit-identical to
    * `conv(substring(md5(c), 1, 14), 16, 10)` without the hex-string
    * round-trip (≈3× less per-row work in the sketch pipelines).
    */
  def sparkHash56(c: Column): Column = graft.functions.GraftFunctions.hash56(c)

  /** Same hash in DuckDB SQL, over an arbitrary SQL expression. */
  def duckHash56(sqlExpr: String): String =
    s"CAST(('0x' || substring(md5($sqlExpr), 1, 14)) AS BIGINT)"

  /** Count-min-sketch cell of `(hash row i, key k)` in `[0, w)` — the
    * ONE spelling of the pairing convention (both operands cast to
    * string, `:` separator, i before k) that makes the x09/st16
    * sketches bit-identical across engines. Keep [[duckCmsBucket]] in
    * lockstep.
    *
    * NULL keys hash via the `"\u0000null"` sentinel (the same
    * convention as [[graft.operators.Sampling.hashBucketPm]]) rather
    * than null-propagating: a NULL bucket would put build-side NULL
    * counts in a cell no equi-join probe can ever reach, so a NULL key
    * seen n times would estimate 0 — silently breaking the sketch's
    * no-underestimate guarantee. With the sentinel, NULL is just one
    * more key: counted at build, estimable at probe, in both engines.
    */
  def cmsBucket(i: Column, k: Column, w: Int): Column =
    sparkHash56(concat(i.cast("string"), lit(":"),
      coalesce(k.cast("string"), lit("\u0000null")))) % w

  /** DuckDB mirror of [[cmsBucket]] over SQL expressions. */
  def duckCmsBucket(iExpr: String, kExpr: String, w: Int): String =
    duckHash56(s"CAST($iExpr AS VARCHAR) || ':' || " +
      s"COALESCE(CAST($kExpr AS VARCHAR), chr(0) || 'null')") +
      s" % $w"

  /** Mersenne prime 2^31-1: modulus for MinHash permutations
    * `(a*h + b) mod p` — products of 31-bit values stay within 62
    * bits, so the arithmetic is exact in BIGINT in both engines.
    */
  val MersenneP: Long = 2147483647L

  /** Deterministic permutation coefficients for MinHash: k pairs
    * (a, b) derived from the portable hash of the permutation index —
    * reproducible in SQL on both engines without a random generator.
    */
  def permCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      // Any fixed odd multipliers work; low bits of md5 of the index
      // keep this reproducible in pure SQL if ever needed there.
      val a = 1L + 2L * (2654435761L * (i + 1) % (MersenneP / 2 - 1))
      val b = 2246822519L * (i + 1) % MersenneP
      (a % MersenneP, b)
    }

  /** `n`-token shingles of a string-array column (Spark side); the
    * DuckDB mirror is `list_transform(generate_series(1, len-n+1),
    * i -> concat_ws(' ', toks[i], ..))`.
    *
    * Documents shorter than `n` tokens yield an EMPTY array — guarded
    * explicitly, because `sequence(0, size-n)` with `size < n` would
    * produce a *descending* sequence (Spark defaults the step to -1
    * when start > stop) and then crash in `slice(..., 0, n)`; DuckDB's
    * `generate_series(1, len-n+1)` is empty in that case, so the guard
    * is also what keeps the two engines aligned.
    */
  def shingleExpr(arrayCol: String, n: Int): Column =
    expr(s"CASE WHEN size($arrayCol) >= $n THEN " +
      s"transform(sequence(0, size($arrayCol) - $n), " +
      s"i -> concat_ws(' ', slice($arrayCol, i + 1, $n))) " +
      s"ELSE CAST(array() AS ARRAY<STRING>) END")
}
