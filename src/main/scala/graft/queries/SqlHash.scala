package graft.queries

/** DuckDB SQL emitters that reproduce [[graft.core.Fingerprint]]'s 64-bit
  * integer hashing BIT-EXACTLY, so the sketch-family driver queries
  * (doc_fingerprint, dedup_simhash) get FULL oracles instead of rows-only
  * checks.
  *
  * Technique: DuckDB BIGINT errors on overflow, so all mod-2^64 arithmetic
  * runs in HUGEINT (128-bit) with 32-bit limb decomposition —
  *   - x·c mod 2^64 = ((x_hi·c_lo + x_lo·c_hi) mod 2^32)·2^32 + x_lo·c_lo
  *     (every partial product < 2^96, well inside HUGEINT);
  *   - x ⊕ y via per-limb BIGINT xor() (limbs < 2^32 are BIGINT-safe);
  *   - x >>> k = x // 2^k on the unsigned HUGEINT representation.
  * Character folds (the rolling polynomial, FNV-1a) are single
  * `list_reduce` passes — no recursion. Verified bit-exact against the JVM
  * for the polynomial+mix64 fingerprint, FNV-1a and SimHash64 (tools
  * prototype, 2026-08-17). Valid for ASCII text (unicode(ch) == UTF-8 byte);
  * the synth corpus is ASCII by construction.
  */
object SqlHash {

  val M64 = "18446744073709551616" // 2^64
  private val B32 = 4294967296L    // 2^32

  /** x ⊕ y for HUGEINT expressions in [0, 2^64). */
  def xor64(a: String, b: String): String =
    s"(CAST(xor(CAST(($a) // $B32 AS BIGINT), CAST(($b) // $B32 AS BIGINT)) AS HUGEINT) * $B32" +
      s" + CAST(xor(CAST(($a) % $B32 AS BIGINT), CAST(($b) % $B32 AS BIGINT)) AS HUGEINT))"

  /** (x · c) mod 2^64 for a HUGEINT expression and an unsigned 64-bit
    * constant (passed as BigInt so 0xbf58476d1ce4e5b9L-style values stay
    * unsigned). */
  def mul64(x: String, c: BigInt): String = {
    val ch = c / B32
    val cl = c % B32
    s"(((((($x) // $B32) * $cl + (($x) % $B32) * $ch) % $B32) * $B32" +
      s" + (($x) % $B32) * $cl) % $M64)"
  }

  def shr(x: String, k: Int): String = s"(($x) // ${BigInt(1) << k})"

  /** Unsigned 2^b powers as a HUGEINT list literal (bit probes / rebuilds). */
  val pows64: String =
    (0 until 64).map(b => s"CAST(${BigInt(1) << b} AS HUGEINT)").mkString("[", ", ", "]")

  /** Unsigned HUGEINT in [0,2^64) → signed BIGINT (Java long bit pattern). */
  def toSigned(v: String): String =
    s"CAST(CASE WHEN ($v) >= 9223372036854775808 THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"

  /** Char-code list of a string expr (ASCII), HUGEINT elements. */
  def charCodes(s: String): String =
    s"list_transform(list_filter(string_split($s, ''), ch -> ch <> ''), ch -> CAST(unicode(ch) AS HUGEINT))"

  /** FNV-1a 64 of a string expression — one list_reduce fold. */
  def fnv1a64(s: String): String = {
    val step = mul64(xor64("h", "c"), BigInt("100000001b3", 16))
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), ${charCodes(s)}), (h, c) -> $step)"
  }

  /** Base-257 rolling polynomial of a string expression (docFingerprint's
    * pre-mix accumulator, init 1125899906842597). */
  def poly257(s: String): String =
    s"list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), ${charCodes(s)}), (h, c) -> (257*h + c) % $M64)"

  /** splitmix64 finalizer staged over CTE columns: returns the 4 SELECT
    * stages to apply to a column named `z` (each stage must land in its own
    * CTE so the argument is a COLUMN — inlining would duplicate the
    * expression ~6× per round). Stage k transforms column z → column z. */
  def mix64Stages: Seq[String] = Seq(
    s"(z + 11400714819323198485) % $M64",
    mul64(xor64("z", shr("z", 30)), BigInt("bf58476d1ce4e5b9", 16)),
    mul64(xor64("z", shr("z", 27)), BigInt("94d049bb133111eb", 16)),
    xor64("z", shr("z", 31)))

  /** WITH-clause body computing mix64 over column `z` of CTE `src`,
    * carrying `keep` columns through; final CTE named `out`. */
  def mix64Ctes(src: String, keep: String, out: String): String = {
    val stages = mix64Stages
    val names = (1 until stages.size).map(i => s"${out}_s$i") :+ out
    names.zip(stages).zipWithIndex.map { case ((name, stage), i) =>
      val from = if (i == 0) src else names(i - 1)
      s"$name AS (SELECT $keep, $stage AS z FROM $from)"
    }.mkString(",\n")
  }
}
