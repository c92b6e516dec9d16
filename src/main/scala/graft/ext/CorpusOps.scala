package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * after cleaning/dedup: benchmark decontamination, sequence packing,
  * mixture reweighting, and deterministic stratified sampling. North-star
  * surface beyond the reference (which stops at feature tables, 04:46-95);
  * every operator is a declarative plan — no UDFs, no driver loops.
  */
object CorpusOps {

  /** Benchmark DECONTAMINATION: for each train doc, how many of its
    * distinct token n-grams appear anywhere in the benchmark set.
    * Output: (id, n_shared, n_ngrams, contamination ∈ [0,1]).
    *
    * Scale shape: the benchmark n-gram SET is collapsed with distinct()
    * and broadcast — eval suites are MBs while the corpus is TBs, so the
    * corpus side never shuffles before the match; the only wide op is the
    * per-doc groupBy over MATCHED rows (≪ corpus n-gram count). Join
    * multiplicity is exactly 1 per (doc, n-gram): both sides are distinct,
    * so count(*) IS the distinct overlap count.
    */
  def ngramOverlap(
      train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, w: Int = 3): DataFrame = {
    // native fused expression (codegen'd): the HOF formulation
    // array_distinct(shingles(...)) is interpreted and dominates the scan
    def sh(df: DataFrame) = df.select(
      col(idCol).as("id"),
      graft.functions.DistinctShingles.distinctShingles(
        split(Dedup.normalized(col(textCol)), " "), w).as("ngrams"))
    val t = sh(train)
      .withColumn("n_ngrams", size(col("ngrams")).cast("long"))
      .select(col("id"), col("n_ngrams"), explode(col("ngrams")).as("ng"))
    val b = sh(bench).select(explode(col("ngrams")).as("ng")).distinct()
    t.join(broadcast(b), Seq("ng"))
      .groupBy(col("id"), col("n_ngrams"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id"), col("n_shared"), col("n_ngrams"),
        (col("n_shared").cast("double") / col("n_ngrams")).as("contamination"))
  }

  /** Cross-source n-gram OVERLAP MATRIX: for every pair of corpus sources,
    * how many distinct w-grams they share and the Jaccard of their shingle
    * sets — the dataset-level contamination/diversity audit run before
    * mixing sources into a training corpus ([[ngramOverlap]] is the
    * per-document variant against one benchmark set).
    *
    * Scale shape: one fused-shingle scan, a (source, ng) distinct (keyed
    * shuffle), then a self-join ON THE SHINGLE — per-shingle fanout is
    * bounded by #sources², and #sources is small by construction, so the
    * pair stage is linear in distinct shingles. No all-pairs, no broadcast
    * of anything data-sized. Output: (src_a, src_b, n_a, n_b, n_shared,
    * jaccard_r), src_a < src_b. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      w: Int = 3): DataFrame = {
    val sh = docs.select(col(srcCol).as("source"),
        graft.functions.DistinctShingles.distinctShingles(
          split(Dedup.normalized(col(textCol)), " "), w).as("ngrams"))
      .select(col("source"), explode(col("ngrams")).as("ng"))
      .distinct()
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("source").as("src_a"), col("ng"))
      .join(sh.select(col("source").as("src_b"), col("ng")), Seq("ng"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(counts.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(counts.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        round(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard_r"))
  }

  /** SEQUENCE PACKING (concat-and-chunk, the GPT training layout): within
    * each `partCol` stream, documents are concatenated in `ordCol` order
    * and the token stream is cut every `budget` tokens. Each doc gets the
    * sequence id and offset where it STARTS (docs may straddle a boundary —
    * that is the concat-and-chunk contract; padding-free).
    *
    * One window (cumulative sum per stream) — a single shuffle on the
    * stream key. At 100 TB the stream key must be high-cardinality
    * (shard/file id, not a 5-value source tag); the window is a running
    * frame, so Spark streams it without materializing partitions.
    */
  def packSequences(
      df: DataFrame, partCol: String, ordCol: String,
      nTokens: org.apache.spark.sql.Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", nTokens)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("cum_before") / budget).cast("long"))
      .withColumn("seq_offset", pmod(col("cum_before"), lit(budget.toLong)))
      .drop("cum_before")
  }

  /** Sliding-window DOCUMENT CHUNKING (RAG / long-context training prep):
    * token windows of `chunkSize` advancing by `stride` (overlap =
    * chunkSize − stride), last window clamped. Pure generate + slice — an
    * embarrassingly parallel projection; output rows ∝ corpus tokens /
    * stride, no shuffle. Output: (id, chunk_id, chunk_tokens array).
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkSize >= stride, "need chunkSize >= stride >= 1")
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .withColumn("k",
        ceil(greatest(size(col("toks")) - chunkSize, lit(0)) / stride.toDouble).cast("int"))
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), col("k"))).as("chunk_id"))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkSize)).as("chunk_tokens"))
  }

  /** MIXTURE REWEIGHTING: given target mixture shares per class, compute
    * each class's natural share and the repeat/sampling factor that
    * realizes the target (factor = target_share / natural_share). The
    * data-mixing step of corpus assembly. One groupBy; the total comes
    * from an ungrouped window over the (tiny, one-row-per-class)
    * aggregate, not a second scan.
    */
  def mixtureReweight(
      df: DataFrame, classCol: String, targets: Map[String, Double]): DataFrame = {
    val tmap = map(targets.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
      .withColumn("natural_share", col("n_docs").cast("double") / col("total"))
      .withColumn("target_share", coalesce(element_at(tmap, col("cls")), lit(0.0)))
      .withColumn("repeat_factor", col("target_share") / col("natural_share"))
      .drop("total")
  }

  /** Deterministic per-class Bernoulli sampling via a Knuth multiplicative
    * hash of the id — reproducible across runs AND engines (pure modular
    * BIGINT arithmetic, no RNG state, no engine-specific hash): a row
    * survives iff ((id mod 1000003) * 2654435761) mod 1000 < rate*1000.
    * The id is reduced mod a prime FIRST so the product never overflows
    * 64-bit for any id. Resolution: 0.1% rate steps.
    *
    * This is the scale-correct sampler: a pure projection predicate —
    * pushed to the scan, no shuffle, no sampling state to coordinate
    * across 1000 executors, and adding data never changes earlier rows'
    * fate (stable under incremental ingest).
    */
  def hashSampled(idCol: org.apache.spark.sql.Column,
      rate: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(idCol.cast("long"), lit(1000003L)) * lit(2654435761L), lit(1000L)) <
      round(rate * 1000, 0).cast("long")

  def hashSampled(idCol: org.apache.spark.sql.Column, rate: Double): org.apache.spark.sql.Column =
    hashSampled(idCol, lit(rate))

  /** DSIR-style IMPORTANCE WEIGHTS over hashed token features (Xie et al.
    * 2023, arXiv:2302.03169: select raw data whose hashed-n-gram feature
    * distribution matches a small in-domain target set): every token maps
    * to one of `buckets` feature buckets via an ENGINE-PORTABLE hash
    * (length/first-char/last-char arithmetic — bit-identical in any SQL
    * engine, unlike murmur/xxhash), and a document's weight is its
    * add-one-smoothed target-mass over background-mass ratio
    *
    *   w(doc) = Σ_b n_b·(ct_b+1)  /  Σ_b n_b·(cb_b+1)
    *
    * (n_b = the doc's tokens in bucket b, ct/cb = target/background bucket
    * totals). This is the LINEAR-affinity variant of DSIR's log-likelihood
    * ratio: numerator and denominator are pure INTEGER sums, so the single
    * final division is the only float op and the weight is bit-identical
    * across engines and partitionings — the log-ratio form would sum
    * per-bucket doubles in engine-dependent order. Ranking behavior is the
    * same (monotone in target affinity); the dial that matters is
    * `buckets`.
    *
    * 100 TB shape: the bucket tables are `buckets` rows (BROADCAST at any
    * corpus size — DSIR's hashed projection exists precisely to make the
    * feature space constant); the corpus side is one explode scan + one
    * (id, bucket) partial-agg shuffle + a map-side broadcast join; weights
    * come out of one id-keyed aggregation. Integer headroom: per-doc
    * Σ n_b·(cb_b+1) ≤ docTokens · corpusTokens ≈ 10³·10¹² at 100 TB —
    * inside Long. Returns (id, w). */
  /** Per-token feature buckets for the DSIR tier: one row per token
    * occurrence, (id, is_t, b). The bucket hash is engine-portable
    * length/char arithmetic — see [[importanceWeights]]. */
  def tokenBuckets(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      idCol: String, textCol: String, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), isTarget.as("is_t"),
        explode(TextStats.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("b",
        (length(col("tok")) * 31 + ascii(col("tok")) * 7 +
          ascii(substring(col("tok"), -1, 1))) % buckets)
      .select(col("id"), col("is_t"), col("b"))

  def importanceWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      idCol: String, textCol: String, buckets: Int = 64): DataFrame = {
    val toks = tokenBuckets(docs, isTarget, idCol, textCol, buckets)
    importanceWeightsAgainst(toks,
      toks.groupBy("b").agg(count(lit(1)).as("cb")),
      toks.filter(col("is_t")).groupBy("b").agg(count(lit(1)).as("ct")))
  }

  /** [[importanceWeights]] scored against GIVEN bucket-count tables
    * (`bcount`: (b, cb), `tcount`: (b, ct)) instead of counts derived
    * from the scored docs themselves — the streaming-admission shape,
    * where the counts are accumulated state from PRIOR batches and the
    * batch at hand must not score against its own contents. `toks` is a
    * [[tokenBuckets]] output. Both count tables stay `buckets` rows —
    * broadcast forever. */
  def importanceWeightsAgainst(toks: DataFrame, bcount: DataFrame,
      tcount: DataFrame): DataFrame =
    toks.groupBy(col("id"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(bcount), Seq("b"), "left")
      .join(broadcast(tcount), Seq("b"), "left")
      .groupBy(col("id"))
      .agg((sum(col("n") * (coalesce(col("ct"), lit(0L)) + 1)).cast("double") /
            sum(col("n") * (coalesce(col("cb"), lit(0L)) + 1)).cast("double")).as("w"))

  /** Weighted sampling WITHOUT replacement from (id, w) rows — the
    * resampling half of DSIR — via Efraimidis–Spirakis A-Res priorities
    * (2006, Inf. Process. Lett.: draw u~U(0,1) per item, keep the k
    * smallest -ln(u)/w; exactly weighted-without-replacement). u comes
    * from the library's engine-portable Knuth multiplicative hash of the
    * id (the [[hashSampled]] recipe), so the draw is deterministic and
    * re-derivable in any engine; the priority is FLOOR-quantized @6 with
    * an id tiebreak — floor of the identical IEEE product is rule-free
    * across engines, where round-half on a computed quotient leaves each
    * engine resolving near-ties by its own path (the q87 sf0.1 lesson).
    * One TakeOrderedAndProject (top-k, no global sort) + a k-row window.
    * Returns (rank, id, w_r, key_r). */
  def weightedSample(weights: DataFrame, k: Int): DataFrame = {
    val u = (((col("id") % 1000003L) * 2654435761L) % 1000000L)
      .cast("double").plus(0.5) / 1000000.0
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0)).cast("double") / lit(1000000.0)
    val keyed = weights.select(col("id"), q6(col("w")).as("w_r"),
      q6(-log(u) / col("w")).as("key_r"))
    keyed.orderBy(col("key_r"), col("id")).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("key_r"), col("id"))).cast("long"))
      .select(col("rank"), col("id"), col("w_r"), col("key_r"))
  }

  /** UniMax waterfilling (Chung et al. 2023, arXiv:2304.09151): spread a
    * total token `budget` over sources, capping each at its capacity —
    * ascending by capacity, each source takes `min(cap, remaining /
    * sources_left)`, so small sources are never over-sampled past their
    * cap (the repetition ceiling temperature sampling ignores) and the
    * budget they can't absorb flows to larger ones. Exact Long floor
    * arithmetic; ties broken by source name — the DuckDB oracle re-derives
    * the identical recurrence as a linear recursive CTE.
    *
    * Runs on the DRIVER over the per-source capacity list: source count
    * is metadata-scale (dozens at 100 TB, never corpus-proportional) and
    * the recurrence is inherently sequential in rank — the same justified
    * driver-side control flow as [[graft.ext.Components]]' convergence
    * check. The corpus-proportional work stays in-plan: capacity
    * aggregation before, selection scan after.
    *
    * @return (source, cap, alloc) in input capacity order.
    */
  def budgetAllocation(caps: Seq[(String, Long)], budget: Long): Seq[(String, Long, Long)] = {
    var remaining = budget
    var left = caps.size
    caps.sortBy { case (s, c) => (c, s) }.map { case (src, cap) =>
      val alloc = math.min(cap, remaining / left)
      remaining -= alloc
      left -= 1
      (src, cap, alloc)
    }
  }

  /** Apply a [[budgetAllocation]] to the corpus: per source, take docs in
    * portable-hash order (stable under reruns and ingest order — the q91
    * recipe) until the running token total reaches the source's
    * allocation. Two corpus scans (capacity agg + selection), one
    * broadcast of the source-count-sized allocation table, and a
    * per-source cumulative-sum window whose WindowGroupLimit-style cost
    * is the per-source sort — at 100 TB the hash order can be
    * pre-materialized as a layout (Layout.zorder) to make this a scan.
    *
    * @return (source, cap, alloc, n_docs, tokens_selected) per source.
    */
  def budgetedSelect(docs: DataFrame, srcCol: String, tokens: org.apache.spark.sql.Column,
      idCol: String, budgetPct: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(srcCol).as("source"), col(idCol).as("id"),
      tokens.cast("long").as("n_tok"))
    val caps = tok.groupBy(col("source")).agg(sum(col("n_tok")).as("cap"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val budget = budgetPct.toLong * caps.map(_._2).sum / 100
    val alloc = budgetAllocation(caps, budget)
      .toDF("source", "cap", "alloc")
    val h = ((col("id") % 1000003L) * 2654435761L) % 1000000007L
    val w = Window.partitionBy(col("source")).orderBy(h, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = tok.withColumn("cum", sum(col("n_tok")).over(w))
      .join(broadcast(alloc.select(col("source"), col("alloc").as("a"))), Seq("source"))
      .filter(col("cum") <= col("a"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens_selected"))
    alloc.join(sel, Seq("source"), "left")
      .select(col("source"), col("cap"), col("alloc"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("tokens_selected"), lit(0L)).as("tokens_selected"))
      .orderBy(col("source"))
  }
}
