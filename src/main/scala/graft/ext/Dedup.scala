package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash-LSH,
  * and exact-Jaccard verification.
  *
  * Scale design:
  *  - Exact dedup is one hash groupBy on the (cheap, pre-computed) key —
  *    the canonical 100 TB dedup pass.
  *  - MinHash-LSH avoids the O(n²) pair explosion: signatures are computed
  *    scan-side with higher-order functions (no UDF), candidates come from a
  *    self-equi-join on (band, bucket) — shuffle keyed on the bucket hash,
  *    so only colliding docs ever meet. Band count × rows bounds the explode
  *    factor.
  *  - Exact Jaccard verifies candidates (or small blocked pair sets) —
  *    array_intersect/union on distinct token sets.
  */
object Dedup {

  /** Canonical text normalization for exact dedup. */
  def normalized(text: Column): Column = lower(trim(text))

  /** Exact dedup: one row per distinct key with representative id + dup
    * count. `keep` must be an ordering-safe representative (min id). */
  def exact(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** 3-word shingles of the token array (w-shingling). */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))

  /** MinHash signature: k independent hash functions via seeded xxhash64;
    * each signature entry is the min hash over the shingle set. */
  def minhashSignature(shin: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shin, s => xxhash64(lit(seed), s)))
    }: _*)

  /** LSH banding: split the signature into `bands` equal slices; each band's
    * hash is a bucket key. Docs sharing ANY band bucket become candidates. */
  def lshBandHashes(sig: Column, k: Int, bands: Int): Column = {
    val rowsPerBand = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
    }: _*)
  }

  /** Exact Jaccard similarity of two distinct-token-set columns — native
    * overlap-counting expression (same exact values as the
    * intersect/union formulation, no per-pair array materialization). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.JaccardSim.jaccardSim(a, b)

  /** End-to-end MinHash-LSH near-dup candidate pairs, verified with exact
    * Jaccard ≥ `threshold`. Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * Shaped for scale:
    *  1. candidate pairs are integer-only — token arrays are NOT carried
    *     through the band join;
    *  2. pairs are deduplicated BEFORE Jaccard, so a pair colliding in
    *     several bands is verified once, not `bands` times;
    *  3. degenerate buckets (> `maxBucketSize` docs — e.g. boilerplate
    *     shingles) are dropped, bounding any bucket's pair blow-up at
    *     maxBucketSize²/2; the standard LSH cap, trades bounded recall loss
    *     on pathological buckets for a hard cost ceiling.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.6,
      maxBucketSize: Int = 500): DataFrame = {
    val toksOf = df.select(
      col(idCol).as("id"),
      array_distinct(split(normalized(col(textCol)), " ")).as("toks"))
    // the native fused expression shingles + hashes + folds all k minima in
    // one pass (graft.functions.MinHashSig); banding still binds the
    // signature as an attribute first so its 8 slices don't re-evaluate it
    val buckets = df
      .select(col(idCol).as("id"),
        graft.functions.MinHashSig.minhashSig(split(normalized(col(textCol)), " "), k).as("sig"))
      .select(col("id"), explode(lshBandHashes(col("sig"), k, bands)).as("bh"))
    val capped = buckets
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bh"))))
      .filter(col("bsize") <= maxBucketSize)
      .drop("bsize")
    val pairs = capped.select(col("bh"), col("id").as("id_a"))
      .join(capped.select(col("bh"), col("id").as("id_b")), Seq("bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(toksOf.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(toksOf.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Blocked all-pairs exact Jaccard (the oracle-friendly near-dup path):
    * pairs are generated only within a blocking key (e.g. source), keeping
    * the join quadratic only per-block. */
  def blockedJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val toks = array_distinct(split(normalized(col(textCol)), " "))
    val p = df.select(col(blockCol).as("block"), col(idCol).as("id"), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast("double"))
    val a = p.select(col("block"), col("id").as("id_a"), col("toks").as("toks_a"), col("n").as("n_a"))
    val b = p.select(col("block"), col("id").as("id_b"), col("toks").as("toks_b"), col("n").as("n_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      // size prefilter, implied by the threshold (J(A,B) ≥ t ⇒ t ≤ |A|/|B| ≤
      // 1/t): skips the O(|A|+|B|) set ops for most pairs, no recall loss
      .filter(col("n_a") >= col("n_b") * threshold && col("n_b") >= col("n_a") * threshold)
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select("block", "id_a", "id_b", "jaccard")
  }
}
