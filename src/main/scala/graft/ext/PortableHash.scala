package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ENGINE-PORTABLE hash family — pure modular BIGINT arithmetic that any
  * ANSI-ish engine reproduces bit-for-bit, so hash-bucketed operators
  * (MinHash-LSH q31, SimHash q39, Count-Min q149, KMV q180/q197/q227)
  * can be FULL-ORACLE-checked instead of rows-only: DuckDB re-derives the
  * exact buckets/signatures with the same `% 1000003` chains, where
  * `xxhash64` would be a Spark-private black box.
  *
  * Family (P = 1000003, a prime > 2^19; Knuth multiplier 2654435761):
  *  - string base hash: left fold over codepoints, `h = (h·31 + c) mod P`,
  *    init 7 — Spark `aggregate` over a `sequence`/`substr` codepoint
  *    array ≡ DuckDB `list_reduce(list_prepend(7, …))` (the q256 fold
  *    recipe; DuckDB's reduce has no zero parameter).
  *  - seeded mix: `mix(h, j) = ((h·(j+1)) mod P · 2654435761) mod P` —
  *    the q149 Count-Min row recipe; j decorrelates the k MinHash
  *    signatures / 64 SimHash bit-hashes from one base hash, so the
  *    O(len) character fold runs ONCE per token, not once per seed.
  *  - chain fold: combines a hash array (shingle windows, band slices)
  *    with `(a·8191 + c) mod P`, init 7.
  *
  * All intermediates stay < 2^52 (max operand ~P·2654435761 ≈ 2.7·10^15),
  * so 64-bit integer arithmetic never wraps on either engine. Everything
  * here is a codegen'd Catalyst expression tree (no UDF).
  */
object PortableHash {

  val P = 1000003L
  val Mix = 2654435761L
  val Chain = 8191L
  val Init = 7L

  /** Base hash of one token: fold of codepoints, `(h·31 + c) mod P`.
    * Caller must pre-filter empty tokens (Spark's `sequence(1, 0)` counts
    * DOWN where DuckDB's `generate_series(1, 0)` is empty). */
  def tokenHash(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)),
        i => ascii(tok.substr(i, lit(1))).cast("long")),
      lit(Init),
      (a, c) => pmod(a * lit(31L) + c, lit(P)))

  /** Chain fold of an array<long> of hashes: `(a·8191 + c) mod P`, init 7. */
  def chainFold(hs: Column): Column =
    aggregate(hs, lit(Init), (a, c) => pmod(a * lit(Chain) + c, lit(P)))

  /** Seeded mix: `((h·(j+1)) mod P · 2654435761) mod P`, j ≥ 0. */
  def mix(h: Column, j: Column): Column =
    pmod(pmod(h * (j + lit(1L)), lit(P)) * lit(Mix), lit(P))

  /** Whitespace tokens of the lower-trimmed text, empties dropped (the
    * double-space guard both engines agree on). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), " "), t => length(t) > 0)

  /** Per-token base hashes of `text`'s [[tokens]]. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), tokenHash(_))

  /** w-shingle hashes from token hashes: each window of `w` consecutive
    * token hashes chain-folded; docs shorter than `w` tokens contribute
    * their whole token-hash sequence as one shingle. Hashing windows of
    * TOKEN hashes (not re-folding characters per shingle) keeps the
    * character pass O(text length) total. */
  def shingleHashes(tokHashes: Column, w: Int = 3): Column =
    when(size(tokHashes) < w, array(chainFold(tokHashes)))
      .otherwise(transform(
        sequence(lit(1), size(tokHashes) - (w - 1)),
        i => chainFold(slice(tokHashes, i, lit(w)))))

  /** MinHash signature: sig[j] = min over shingles of mix(shingle, j),
    * j ∈ [0, k). */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(shingles, h => mix(h, lit(j.toLong))))
    }: _*)

  /** LSH band buckets of a signature: `bands` equal slices, each
    * chain-folded to a bucket key; output array<struct<band, bucket>>. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rowsPerBand = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        chainFold(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)
  }

  /** Portable SimHash bit votes: 64 per-bit sums over all tokens, one
    * array-accumulator fold (no 64× row explosion). Vote of token hash h
    * on bit b is +1 iff mix(h, b) lands in the top half of [0, P).
    * Bind the result as its own column before [[simhashPack]] so the
    * fold evaluates once, not once per packed bit. */
  def simhashVotes(tokHashes: Column): Column =
    aggregate(
      tokHashes,
      typedLit(Seq.fill(64)(0L)),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          b => when(mix(h, b.cast("long")) * 2 >= lit(P), lit(1L))
            .otherwise(lit(-1L))),
        (a, v) => a + v))

  /** Pack 64 bit votes into FOUR 16-bit band keys (array<long>, each ∈
    * [0, 65536)): bit b set iff votes[b] > 0 (zero-vote ties are 0). Band
    * keys instead of one packed int64 keep bit 63 away from BIGINT sign
    * overflow and give the 4×16 LSH banding its join keys directly. */
  def simhashPack(votes: Column): Column = {
    val pow2 = typedLit((0 until 16).map(i => 1L << i))
    transform(sequence(lit(0), lit(3)), band =>
      aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, i) =>
        acc + when(get(votes, band * 16 + i) > 0, get(pow2, i)).otherwise(lit(0L))))
  }
}
