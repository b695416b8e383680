package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftright}

/** The engine's portable 2-round multiplicative mixer over Z_2^32 —
  * THE shared integer hash both engines can compute identically in
  * plain arithmetic (no engine-specific hash function), used by the
  * KMV sketches (x15/w16) and the graft-seq connector's synthetic
  * table (x20). One definition, three surfaces (Column expression,
  * oracle SQL text, plain Long), so the cross-engine equality the
  * sketch and the x20 oracle depend on cannot drift between copies.
  *
  * Round 1 is a SPLIT 32×32→mod-2^32 multiply — (kl·M1 + kh·(M1·2^16
  * mod 2^32)) mod 2^32 with k = key mod 2^32 split at 16 bits —
  * because the naive key·M1 overflows Int64 (an ANSI runtime throw in
  * Spark, an out-of-range error in DuckDB) once keys pass ~3.4e9.
  * Congruence mod 2^32 makes the split form equal to the naive one
  * wherever that one was defined. Keys must be NONNEGATIVE (both
  * engines' % keeps the dividend's sign). Max intermediates: round 1
  * ≈ 3.1e14, round 2 ≈ 2^32·M2 ≈ 6.6e18 — both < 2^63.
  *
  * Odd constants ⇒ the mixer is bijective over Z_2^32, so distinct
  * hashes == distinct keys FOR KEYS < 2^32; keys ≥ 2^32 fold mod 2^32
  * first (key and key + 2^32 collide) — fine for a sketch, but not
  * for an exact-distinct count (x15 counts keys, not hashes, for its
  * exact witness for precisely this reason).
  */
object Mix32 {
  val M1 = 2654435761L // Knuth multiplicative (odd)
  val M2 = 1540483477L // MurmurHash-lineage constant (odd)
  val MOD = 4294967296L // 2^32
  val C1 = (M1 << 16) % MOD // (M1·2^16) mod 2^32 = 2041643008

  /** Column form (codegen'd integer expressions) */
  def hash(key: Column): Column = {
    val k = key % MOD
    val mixed =
      (k.bitwiseAND(lit(65535L)) * M1 + shiftright(k, 16) * C1) % MOD
    (mixed * M2 + 12345L) % MOD
  }

  /** oracle SQL text over a column/expression `key` */
  def sql(key: String): String =
    s"(((($key % $MOD) % 65536) * $M1" +
      s" + (($key % $MOD) // 65536) * $C1) % $MOD" +
      s" * $M2 + 12345) % $MOD"

  /** plain Long form (connector readers, tests) */
  def mix(i: Long): Long = {
    val k = i % MOD
    (((k & 65535L) * M1 + (k >> 16) * C1) % MOD * M2 + 12345L) % MOD
  }
}
