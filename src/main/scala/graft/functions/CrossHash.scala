package graft.functions

/** Cross-engine deterministic text/vector hashing primitives.
  *
  * Every primitive is pure int64 / IEEE-double arithmetic with a pinned
  * evaluation order, emitted twice from the same constants: once as a Spark
  * SQL expression (codegen'd higher-order functions — no UDFs) and once as
  * DuckDB SQL for the oracle. This is what makes MinHash/SimHash/fingerprint
  * results hash-identical across engines, something library hash functions
  * (murmur, xxhash) can't give us.
  *
  * Numeric safety: the fold keeps `acc < P ≈ 2^30`, so `acc*31 + char`
  * stays < 2^36 and `a*x + b` (minhash permutation) stays < 2^61 — all
  * exact in int64 on both engines.
  */
object CrossHash {
  /** Modulus for all polynomial hashes. */
  val P = 1000000007L

  /** Multiplicative scramble for sampling coins: the raw char-fold of a
    * SHORT id string (a handful of chars) never wraps P, so its low-order
    * residues inherit the string's structure — measured: `hash('m|'||id)
    * % 10000` spans only [6498, 9669] over 500 ids, which silently zeroes
    * a 30% acceptance rate. One multiply mod P restores uniformity
    * (measured span [14, 9979], mean ≈ 5030). Exact in int64: h < 2^30,
    * h·scramble < 2^62. */
  val CoinScramble = 2654435761L

  /** MinHash permutation constants (a_j, b_j), pinned. */
  val MinhashPerms: Seq[(Long, Long)] = (0 until 16).map { j =>
    // simple fixed LCG over j; values pinned forever once committed
    val a = ((j * 2654435761L + 1234567L) % (P - 1)) + 1
    val b = (j * 40503L * 65537L + 9176L) % P
    (a, b)
  }

  /** MinHash banding: 4 bands x 4 rows. Wider rows cut false candidates
    * sharply (collision prob J^4 per band) while keeping near-certain
    * recall for J >= 0.9 dups — the knob that keeps the candidate join
    * near-linear at corpus scale. */
  val Bands = 4
  val BandRows = 4

  /** SimHash width: shingle hashes are ~uniform on [0, P) ≈ 30 bits, so one
    * hash yields 30 usable bits. A second independent permutation
    * g = (A2·h + B2) mod P contributes bits 30..59 — a 60-bit signature,
    * which LSH splits into 4 blocks of 15 bits (4 × 32768 = 131072 buckets;
    * the round-1 30-bit/8-bit-block variant had 1024 buckets total and went
    * quadratic within buckets as the corpus grew). */
  val SimhashBits = 60
  val SimhashBlockBits = 15
  val SimhashBlocks = 4
  /** Second-feature permutation constants (pinned forever once committed). */
  val Simhash2A = 982451653L
  val Simhash2B = 541L

  // -------------------------------------------------------------------------
  // Spark SQL expression builders (strings for functions.expr)
  // -------------------------------------------------------------------------

  /** Polynomial char-fold hash of a string expr → [0, P). Emits the native
    * codegen'd expression (graft/functions/TextHashExpressions.scala) —
    * call [[graft.functions.TextHashFunctions.register]] on the session
    * first. The SQL-HOF rendering (`aggregate(split(in,''), ...)`) computes
    * the same value but runs interpreted per character. */
  def charHashSpark(in: String): String = s"char_hash($in)"

  /** Whitespace tokens with empties dropped (cross-engine safe on any
    * spacing). */
  def tokensSpark(in: String): String =
    s"filter(split($in, ' '), t -> t != '')"

  /** Uniform [0, 10000) sampling coin from a (salted) id expression. */
  def coinSpark(in: String): String =
    s"(${charHashSpark(in)} * $CoinScramble) % $P % 10000"

  /** Per-token polynomial hashes straight from the string (native codegen;
    * tokenization + hashing in one pass, matching tokensSpark semantics). */
  def wordHashesSpark(text: String): String = s"word_hashes($text)"

  /** Word 3-gram shingle hashes combined arithmetically from word hashes
    * (native codegen; same ((a*31+b)*31+c) % P combine as the oracle). */
  def shingleHashesSpark(wh: String): String = s"shingle_hashes($wh)"

  /** MinHash signature: 16 permutation-mins over the shingle set (native
    * codegen single pass — the SQL array_min/transform rendering scans the
    * array 16 times, interpreted). */
  def minhashSigSpark(sh: String): String = s"minhash_sig($sh)"

  /** 60-bit SimHash feature per shingle hash `h` (< 2^30): low 30 bits are
    * `h` itself, high 30 an independent permutation — uniform across all
    * SimhashBits positions. The bit-majority itself is computed
    * relationally (explode + conditional sums — codegen'd), not as a HOF
    * fold: see Dedup.dedup_simhash. */
  def simhashFeatureSpark(h: String): String =
    s"(($h) + shiftleft(($Simhash2A * ($h) + $Simhash2B) % $P, 30))"

  /** Dot product of two float-array exprs in double precision, strict
    * left-to-right index order (identical IEEE result on both engines). */
  def dotSpark(a: String, b: String, dim: Int): String =
    s"""aggregate(sequence(1, $dim), cast(0.0 as double),
        (acc, i) -> acc + cast(element_at($a, i) as double)
                        * cast(element_at($b, i) as double))"""

  /** Squared L2 norm, same ordering discipline. */
  def norm2Spark(a: String, dim: Int): String =
    s"""aggregate(sequence(1, $dim), cast(0.0 as double),
        (acc, i) -> acc + cast(element_at($a, i) as double)
                        * cast(element_at($a, i) as double))"""

  // -------------------------------------------------------------------------
  // DuckDB SQL builders (the oracle side; list_reduce needs a seed element)
  // -------------------------------------------------------------------------

  def charHashDuck(in: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($in, ''), " +
      s"c -> unicode(c)::BIGINT)), (acc, c) -> (acc * 31 + c) % $P)"

  def tokensDuck(in: String): String =
    s"list_filter(string_split($in, ' '), t -> t != '')"

  def coinDuck(in: String): String =
    s"(${charHashDuck(in)} * $CoinScramble) % $P % 10000"

  def wordHashesDuck(tokens: String): String =
    s"list_transform($tokens, w -> ${charHashDuck("w")})"

  def shingleHashesDuck(wh: String): String =
    s"list_transform(range(1, greatest(len($wh) - 2, 0) + 1), " +
      s"i -> ((list_extract($wh, i) * 31 + list_extract($wh, i + 1)) * 31 " +
      s"+ list_extract($wh, i + 2)) % $P)"

  def minhashSigDuck(sh: String): String = {
    val mins = MinhashPerms.map { case (a, b) =>
      s"list_min(list_transform($sh, x -> ($a * x + $b) % $P))"
    }
    s"[${mins.mkString(", ")}]"
  }

  def simhashFeatureDuck(h: String): String =
    s"(($h) + ((($Simhash2A * ($h) + $Simhash2B) % $P) << 30))"

  def dotDuck(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${dim + 1}), " +
      s"i -> list_extract($a, i)::DOUBLE * list_extract($b, i)::DOUBLE)), (acc, x) -> acc + x)"

  def norm2Duck(a: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${dim + 1}), " +
      s"i -> list_extract($a, i)::DOUBLE * list_extract($a, i)::DOUBLE)), (acc, x) -> acc + x)"

  /** Band bucket key: polynomial combine of the band's signature rows
    * (exact in int64; spurious key collisions only add candidates that the
    * exact verify rejects). `sig` is 1-based-indexed on both engines. */
  def bandKeySpark(sig: String, band: String): String =
    (1 to BandRows).map(r => s"element_at($sig, $BandRows * $band + $r)")
      .reduce((a, b) => s"($a * 31 + $b)")

  def bandKeyDuck(sig: String, band: String): String =
    (1 to BandRows).map(r => s"list_extract($sig, $BandRows * $band + $r)")
      .reduce((a, b) => s"($a * 31 + $b)")
}
