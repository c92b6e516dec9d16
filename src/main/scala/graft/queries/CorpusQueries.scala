package graft.queries

import graft.{Q, QueryDsl}
import QueryDsl._
import graft.ext.{CorpusOps, TextStats}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators (decontamination, packing, mixing, sampling)
  * over `documents` — the post-dedup steps of a training-data pipeline.
  * All deterministic and DuckDB-oracled.
  */
object CorpusQueries {

  /** Benchmark decontamination: docs sharing ≥20% of their distinct token
    * 3-grams with a held-out benchmark set (doc_id % 50 = 0 stands in for
    * the eval suite). The benchmark n-gram set is broadcast — the corpus
    * side never shuffles before the match. */
  val q65Decontaminate: Q = Q(
    "q65_decontaminate",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusOps.ngramOverlap(
          d.filter(col("doc_id") % 50 =!= 0),
          d.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", w = 3)
        .filter(col("contamination") >= 0.2)
        .select(col("id").as("doc_id"), col("n_shared"), col("n_ngrams"),
          col("contamination"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
      ), sh AS (
        SELECT doc_id, list_distinct(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END) AS ngrams
        FROM toks
      ), bench AS (
        SELECT DISTINCT unnest(ngrams) AS ng FROM sh WHERE doc_id % 50 = 0
      ), train AS (
        SELECT doc_id, len(ngrams) AS n_ngrams, unnest(ngrams) AS ng
        FROM sh WHERE doc_id % 50 <> 0
      )
      SELECT train.doc_id AS doc_id,
        COUNT(*) AS n_shared,
        CAST(n_ngrams AS BIGINT) AS n_ngrams,
        CAST(COUNT(*) AS DOUBLE) / n_ngrams AS contamination
      FROM train JOIN bench USING (ng)
      GROUP BY train.doc_id, n_ngrams
      HAVING CAST(COUNT(*) AS DOUBLE) / n_ngrams >= 0.2
    """))

  /** FUZZY decontamination ([[graft.ext.Dedup.prefixNearDupMatches]]):
    * whole-document near-match against the benchmark set (doc_id % 97 = 0
    * stands in for the eval suite) at token-set Jaccard ≥ 0.8 — catches
    * lightly edited/reformatted test leakage that q65's n-gram overlap
    * rate misses the shape of. Scale shape: the BENCHMARK is indexed
    * ([[graft.ext.Dedup.prefixIndex]], tiny) and the corpus probes it, so
    * candidates ∝ the benchmark's prefix postings — corpus-internal
    * near-dup density never inflates the cost. The prefix candidate
    * generator is lossless ⇒ the oracle is the plain all-pairs MAX
    * formulation. */
  val q116FuzzyDecontam: Q = Q(
    "q116_fuzzy_decontam",
    (s, dir) => {
      import graft.ext.Dedup
      val d = t(s, dir, "documents")
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
      val (postings, vocab) = Dedup.prefixIndex(bench, "doc_id", "text", 0.8)
      Dedup.prefixNearDupMatches(corpus, postings, vocab, "doc_id", "text", 0.8)
        .withColumnRenamed("id", "doc_id")
        .join(corpus.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("max_jaccard"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split(lower(trim(text)), ' ')) AS t
        FROM documents
      ), bench AS (SELECT * FROM toks WHERE doc_id % 97 = 0),
         corp  AS (SELECT * FROM toks WHERE doc_id % 97 <> 0)
      SELECT c.doc_id, c.source,
        MAX(CAST(len(list_intersect(c.t, b.t)) AS DOUBLE)
            / len(list_distinct(list_concat(c.t, b.t)))) AS max_jaccard
      FROM corp c JOIN bench b
        ON CAST(len(list_intersect(c.t, b.t)) AS DOUBLE)
           / len(list_distinct(list_concat(c.t, b.t))) >= 0.8
      GROUP BY c.doc_id, c.source
    """))

  /** Concat-and-chunk sequence packing at a 512-token budget: every doc's
    * starting sequence id + offset within its source stream. One window
    * shuffle keyed on the stream. */
  val q66PackSequences: Q = Q(
    "q66_pack_sequences",
    (s, dir) =>
      CorpusOps.packSequences(
          t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")),
          "source", "doc_id", TextStats.nTokens(col("text")), budget = 512)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("seq_id"), col("seq_offset")),
    Some("""
      WITH c AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
      ), w AS (
        SELECT doc_id, source, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        FROM c
      )
      SELECT doc_id, source, n_tokens,
        CAST(cum_before // 512 AS BIGINT) AS seq_id,
        CAST(cum_before % 512 AS BIGINT) AS seq_offset
      FROM w
    """))

  /** Data-mixing reweight: natural vs target share per source and the
    * repeat factor realizing the target (src0-src3 upweighted, the rest
    * dropped). */
  val q68MixtureReweight: Q = Q(
    "q68_mixture_reweight",
    (s, dir) =>
      CorpusOps.mixtureReweight(
          t(s, dir, "documents"), "source",
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
        .select(col("cls").as("source"), col("n_docs"), col("natural_share"),
          col("target_share"), col("repeat_factor")),
    Some("""
      WITH agg AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
      )
      SELECT source, n_docs,
        CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS natural_share,
        (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
          WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
          ELSE 0.0 END)::DOUBLE AS target_share,
        (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
          WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 ELSE 0.0 END)::DOUBLE
          / (CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) AS repeat_factor
      FROM agg
    """))

  /** Deterministic stratified sampling: per-source Bernoulli via a Knuth
    * multiplicative hash of doc_id (engine-portable modular arithmetic —
    * the same rows survive in Spark and DuckDB). src0 at 50%, src1 at
    * 25%, everything else at 10%. */
  val q69StratifiedSample: Q = Q(
    "q69_stratified_sample",
    (s, dir) => {
      val rate = coalesce(
        element_at(map(lit("src0"), lit(0.5), lit("src1"), lit(0.25)), col("source")),
        lit(0.1))
      t(s, dir, "documents")
        .withColumn("keep", CorpusOps.hashSampled(col("doc_id"), rate))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_total"),
          countIf(col("keep")).as("n_sampled"),
          (countIf(col("keep")).cast("double") / count(lit(1))).as("realized_rate"))
    },
    Some("""
      SELECT source, COUNT(*) AS n_total,
        CAST(SUM(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
          (CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250 ELSE 100 END)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        CAST(SUM(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
          (CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250 ELSE 100 END)
          THEN 1 ELSE 0 END) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS realized_rate
      FROM documents
      GROUP BY source
    """))

  private val stops = Seq("the", "a", "of", "and", "is")
  private val stopsSqlList = stops.map(s => s"'$s'").mkString(", ")

  /** Quantile-based quality filtering: drop each source's bottom quality
    * decile (percent_rank window — rank cutoffs adapt per source instead
    * of one global threshold) and anything with ≥50% repeated 3-grams
    * (Gopher-style repetition). Output: per-source survivor stats. */
  val q70QualityFilter: Q = Q(
    "q70_quality_filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val scored = d.select(col("doc_id"), col("source"),
        TextStats.qualityScore(col("text"), stops).as("quality"),
        TextStats.repetitionRatio(col("text"), 3).as("rep_ratio"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("quality"))
      scored.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= 0.1 && col("rep_ratio") <= 0.5)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_kept"),
          min(col("quality")).as("min_quality"),
          (sum(col("quality")).cast("double") / count(lit(1))).as("avg_quality"))
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
          CAST((CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                  x -> x IN ($stopsSqlList))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.03 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                  x -> length(x))) AS DOUBLE)
                / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
                THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.3 THEN 25 ELSE 0 END) AS INT)
            AS quality,
          1.0 - CAST(len(list_distinct(
              CASE WHEN len(string_split(text, ' ')) < 3
                THEN [array_to_string(string_split(text, ' '), ' ')]
              ELSE list_transform(
                generate_series(1, CAST(len(string_split(text, ' ')) AS INT) - 2),
                i -> concat_ws(' ', string_split(text, ' ')[i],
                  string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))
              END)) AS DOUBLE)
            / greatest(len(string_split(text, ' ')) - 2, 1) AS rep_ratio
        FROM documents
      ), ranked AS (
        SELECT source, quality, rep_ratio,
          PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality) AS pr
        FROM scored
      )
      SELECT source, COUNT(*) AS n_kept, MIN(quality) AS min_quality,
        CAST(SUM(quality) AS DOUBLE) / COUNT(*) AS avg_quality
      FROM ranked
      WHERE pr >= 0.1 AND rep_ratio <= 0.5
      GROUP BY source
    """))

  /** q70's documented 100 TB scale path, now a first-class operator: the
    * per-source cutoff comes from an exact `percentile` AGGREGATE (type-7
    * interpolation, same as DuckDB `quantile_cont`) broadcast back onto the
    * scoring scan — NO per-source sort anywhere. q70's percent_rank window
    * must sort every source's rows; this shape pays two scans of the corpus
    * (cutoff pass + filter pass, both embarrassingly parallel) and a
    * 20-row broadcast instead, which is the winning trade at any real
    * scale. Keep-side semantics differ from q70 at ties by design
    * (value-threshold vs rank-threshold); both are documented quantile
    * filters. At 100 TB the exact percentile can be swapped for
    * approx_percentile(…, accuracy) without changing the plan shape. */
  val q89QualityCutoff: Q = Q(
    "q89_quality_cutoff",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val scored = d.select(col("doc_id"), col("source"),
        TextStats.qualityScore(col("text"), stops).as("quality"),
        TextStats.repetitionRatio(col("text"), 3).as("rep_ratio"))
      val cuts = scored.groupBy(col("source"))
        .agg(expr("percentile(quality, 0.1)").as("cutoff"))
      scored.join(broadcast(cuts), Seq("source"))
        .filter(col("quality") >= col("cutoff") && col("rep_ratio") <= 0.5)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_kept"),
          min(col("cutoff")).as("cutoff"),
          min(col("quality")).as("min_quality"),
          (sum(col("quality")).cast("double") / count(lit(1))).as("avg_quality"))
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
          CAST((CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                  x -> x IN ($stopsSqlList))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.03 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                  x -> length(x))) AS DOUBLE)
                / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
                THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.3 THEN 25 ELSE 0 END) AS INT)
            AS quality,
          1.0 - CAST(len(list_distinct(
              CASE WHEN len(string_split(text, ' ')) < 3
                THEN [array_to_string(string_split(text, ' '), ' ')]
              ELSE list_transform(
                generate_series(1, CAST(len(string_split(text, ' ')) AS INT) - 2),
                i -> concat_ws(' ', string_split(text, ' ')[i],
                  string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))
              END)) AS DOUBLE)
            / greatest(len(string_split(text, ' ')) - 2, 1) AS rep_ratio
        FROM documents
      ), cuts AS (
        SELECT source, quantile_cont(quality, 0.1) AS cutoff
        FROM scored GROUP BY source
      )
      SELECT s.source, COUNT(*) AS n_kept, MIN(cutoff) AS cutoff,
        MIN(quality) AS min_quality,
        CAST(SUM(quality) AS DOUBLE) / COUNT(*) AS avg_quality
      FROM scored s JOIN cuts c ON s.source = c.source
      WHERE s.quality >= c.cutoff AND s.rep_ratio <= 0.5
      GROUP BY s.source
    """))

  /** Exactly-k-per-class deterministic sampling — q69's rate-based predicate
    * cannot promise a COUNT; eval-set construction ("give me exactly 10 docs
    * per language, reproducibly") needs rank-by-hash: order each class by
    * the same engine-portable Knuth multiplicative hash q69 uses (pure
    * function of doc_id — stable under reruns and ingest order) and keep
    * the first k. Spark 4 plans the rank filter as WindowGroupLimit
    * (partial top-k BEFORE the shuffle), so each class moves ≤ k rows per
    * input partition — never a full per-class sort of the corpus. */
  val q91ClassSample: Q = Q(
    "q91_class_sample",
    (s, dir) => {
      val k = 10
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
        lit(1000000007L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(h, col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), h.as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col("lang"), col("rk"), col("doc_id"), col("h"))
    },
    Some("""
      SELECT lang, rk, doc_id, h FROM (
        SELECT lang, doc_id, (doc_id % 1000003) * 2654435761 % 1000000007 AS h,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY (doc_id % 1000003) * 2654435761 % 1000000007, doc_id)
            AS BIGINT) AS rk
        FROM documents)
      WHERE rk <= 10
    """))

  /** Sliding-window chunking at 32 tokens / stride 24 (25% overlap): every
    * chunk with its token count and content fingerprint — deterministic
    * string ops on both engines, so the chunk CONTENT is oracle-checked,
    * not just the counts. */
  val q76ChunkDocuments: Q = Q(
    "q76_chunk_documents",
    (s, dir) =>
      CorpusOps.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .select(col("id").as("doc_id"), col("chunk_id"),
          size(col("chunk_tokens")).cast("long").as("n_tokens"),
          sha2(concat_ws(" ", col("chunk_tokens")), 256).as("chunk_fp")),
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
      ), spans AS (
        SELECT doc_id, t,
          unnest(generate_series(0,
            CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS INT))) AS chunk_id
        FROM toks
      )
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        CAST(len(list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT)
          AS n_tokens,
        sha256(array_to_string(list_slice(t, chunk_id * 24 + 1, chunk_id * 24 + 32), ' '))
          AS chunk_fp
      FROM spans
    """))

  /** Cross-source shingle overlap matrix ([[CorpusOps.sourceOverlap]]):
    * pairwise distinct-3-gram sharing + Jaccard between corpus sources —
    * the pre-mixing contamination/diversity audit. */
  val q97SourceOverlap: Q = Q(
    "q97_source_overlap",
    (s, dir) =>
      CorpusOps.sourceOverlap(t(s, dir, "documents"), "source", "text", w = 3),
    Some("""
      WITH toks AS (
        SELECT source, string_split(lower(trim(text)), ' ') AS t FROM documents
      ), sh AS (
        SELECT source, list_distinct(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END) AS ngrams
        FROM toks
      ), sng AS (
        SELECT DISTINCT source, unnest(ngrams) AS ng FROM sh
      ), counts AS (
        SELECT source, COUNT(*) AS n FROM sng GROUP BY source
      ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM sng a JOIN sng b ON a.ng = b.ng AND a.source < b.source
        GROUP BY 1, 2
      )
      SELECT src_a, src_b, ca.n AS n_a, cb.n AS n_b, n_shared,
        round(CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared), 6) AS jaccard_r
      FROM pairs
      JOIN counts ca ON ca.source = src_a
      JOIN counts cb ON cb.source = src_b
    """))

  /** Temperature-scaled mixture sampling (the multilingual-corpus
    * balancing rule, τ = 0.7): sampling weights ∝ natural_shareᵗ,
    * renormalized — flattens the source distribution without inverting it,
    * where q68's explicit targets require a hand-written mixture. Shares
    * derive from exact counts; the pow terms are rounded@9 then summed in
    * decimal so renormalization is engine-exact. Two metadata-sized
    * aggregates — nothing data-proportional beyond the source counts. */
  val q101TemperatureMix: Q = Q(
    "q101_temperature_mix",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val withP = counts
        .crossJoin(broadcast(counts.agg(sum(col("n_docs")).as("t"))))
        .select(col("source"), col("n_docs"),
          (col("n_docs").cast("double") / col("t")).as("p"))
        .withColumn("pt", round(pow(col("p"), 0.7), 9))
      withP
        .crossJoin(broadcast(withP.agg(
          sum(col("pt").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
            .cast("double").as("z"))))
        .select(col("source"), col("n_docs"),
          round(col("p"), 6).as("share_r"),
          round(col("pt") / col("z"), 6).as("temp_share_r"),
          round(col("pt") / col("z") / col("p"), 6).as("sample_factor_r"))
    },
    Some("""
      WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      withp AS (
        SELECT source, n_docs,
          CAST(n_docs AS DOUBLE) / (SELECT SUM(n_docs) FROM counts) AS p
        FROM counts),
      withpt AS (
        SELECT source, n_docs, p, round(power(p, 0.7), 9) AS pt FROM withp),
      z AS (
        SELECT CAST(SUM(CAST(pt AS DECIMAL(28,10))) AS DOUBLE) AS z FROM withpt)
      SELECT source, n_docs,
        round(p, 6) AS share_r,
        round(pt / z, 6) AS temp_share_r,
        round(pt / z / p, 6) AS sample_factor_r
      FROM withpt, z
    """))

  /** DSIR-style data selection end-to-end ([[CorpusOps.importanceWeights]]
    * → [[CorpusOps.weightedSample]]): English docs are the in-domain
    * target; every doc scores its hashed-token-feature affinity to that
    * target over the whole-corpus background (integer-exact linear
    * variant of the DSIR log-ratio — see the operator scaladoc), and 200
    * docs are drawn weighted-without-replacement via deterministic
    * Efraimidis–Spirakis priorities. Fully re-derivable in DuckDB: the
    * bucket hash is portable arithmetic, both weight sums are integers,
    * and the one-ln priority is floor-quantized @6 with an id tiebreak. */
  val q126ImportanceResample: Q = Q(
    "q126_importance_resample",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusOps.weightedSample(
        CorpusOps.importanceWeights(d, col("lang") === "en", "doc_id", "text"),
        k = 200)
        .withColumnRenamed("id", "doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
      ), tb AS (
        SELECT doc_id, lang,
          (length(tok) * 31 + ascii(tok) * 7 + ascii(substr(tok, -1, 1))) % 64 AS b
        FROM toks WHERE length(tok) > 0
      ), bcount AS (
        SELECT b, COUNT(*) AS cb FROM tb GROUP BY 1
      ), tcount AS (
        SELECT b, COUNT(*) AS ct FROM tb WHERE lang = 'en' GROUP BY 1
      ), docb AS (
        SELECT doc_id, b, COUNT(*) AS n FROM tb GROUP BY 1, 2
      ), scored AS (
        SELECT doc_id,
          CAST(SUM(n * (COALESCE(ct, 0) + 1)) AS DOUBLE)
            / CAST(SUM(n * (cb + 1)) AS DOUBLE) AS w
        FROM docb JOIN bcount USING (b) LEFT JOIN tcount USING (b)
        GROUP BY 1
      ), keyed AS (
        SELECT doc_id, floor(w * 1000000.0) / 1000000.0 AS w_r,
          floor((-ln((((doc_id % 1000003) * 2654435761) % 1000000 + 0.5)
            / 1000000.0) / w) * 1000000.0) / 1000000.0 AS key_r
        FROM scored
      )
      SELECT rank, doc_id, w_r, key_r FROM (
        SELECT doc_id, w_r, key_r,
          CAST(ROW_NUMBER() OVER (ORDER BY key_r, doc_id) AS BIGINT) AS rank
        FROM keyed
      ) WHERE rank <= 200
    """))

  /** UniMax budget-capped mixing ([[CorpusOps.budgetAllocation]], Chung
    * et al. 2023): waterfill 40% of the corpus token budget over sources
    * ascending by capacity — each source gets `min(cap, remaining /
    * sources_left)` so small sources cap out instead of being
    * over-sampled (the failure mode of q101's temperature weights) — then
    * apply the allocation with per-source portable-hash-ordered
    * cumulative-token selection. Exact Long floor arithmetic end to end;
    * the DuckDB twin re-derives the sequential waterfilling as a linear
    * recursive CTE over capacity-ranked sources. */
  val q132BudgetMix: Q = Q(
    "q132_budget_mix",
    (s, dir) =>
      CorpusOps.budgetedSelect(t(s, dir, "documents"), "source",
        size(split(col("text"), " ")), "doc_id", budgetPct = 40),
    Some("""
      WITH RECURSIVE tok AS (
        SELECT source, doc_id AS id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
      ), caps AS (
        SELECT source, CAST(SUM(n_tok) AS BIGINT) AS cap FROM tok GROUP BY source
      ), b AS (
        SELECT CAST(40 * SUM(cap) // 100 AS BIGINT) AS budget FROM caps
      ), ranked AS (
        SELECT source, cap,
          CAST(ROW_NUMBER() OVER (ORDER BY cap, source) AS BIGINT) AS i,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM caps
      ), walloc AS (
        SELECT r.i, r.source, r.cap,
          LEAST(r.cap, b.budget // r.n) AS alloc,
          b.budget - LEAST(r.cap, b.budget // r.n) AS rem
        FROM ranked r, b WHERE r.i = 1
        UNION ALL
        SELECT r.i, r.source, r.cap,
          LEAST(r.cap, w.rem // (r.n - w.i)) AS alloc,
          w.rem - LEAST(r.cap, w.rem // (r.n - w.i)) AS rem
        FROM ranked r JOIN walloc w ON r.i = w.i + 1
      ), sel AS (
        SELECT t.source, t.n_tok,
          SUM(t.n_tok) OVER (PARTITION BY t.source
            ORDER BY (t.id % 1000003) * 2654435761 % 1000000007, t.id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM tok t
      ), stats AS (
        SELECT s.source, COUNT(*) AS n_docs,
          CAST(SUM(s.n_tok) AS BIGINT) AS tokens_selected
        FROM sel s JOIN walloc a ON s.source = a.source
        WHERE s.cum <= a.alloc GROUP BY s.source
      )
      SELECT a.source, a.cap, a.alloc,
        COALESCE(st.n_docs, 0) AS n_docs,
        COALESCE(st.tokens_selected, 0) AS tokens_selected
      FROM walloc a LEFT JOIN stats st ON a.source = st.source
      ORDER BY a.source
    """))

  /** C4-STYLE PER-SOURCE CAP — the domain-cap pass every web-scale corpus
    * runs before mixing (C4 capped pages per domain so no single site
    * dominates training): each source keeps at most CAP documents,
    * selected by the engine-portable modular hash (reproducible sampling,
    * the q149/q160 recipe) with a doc_id tiebreak. One keyed window
    * (row_number per source — never a global sort) + grouped audit
    * counts; `id_sum` checksums the exact selected set so the oracle
    * pins WHICH docs survived, not just how many. At 100 TB the window
    * shuffles on source; a pathological single-source corpus would salt
    * by hash-prefix first (the q98 recipe) — documented dial. */
  lazy val q161DomainCap: Q = Q(
    "q161_domain_cap",
    (s, dir) => {
      val cap = 300
      val d = t(s, dir, "documents").withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(1000003L)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      val kept = d.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"),
          sum(col("doc_id")).as("id_sum"))
        .join(
          d.groupBy(col("source")).agg(count(lit(1)).as("n_total")),
          Seq("source"))
        .select(col("source"), col("n_total"), col("n_kept"),
          col("chars_kept"), col("id_sum"))
    },
    Some("""
      WITH h AS (
        SELECT *, (doc_id % 1000003) * 2654435761 % 1000003 AS h
        FROM documents),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        FROM h),
      kept AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
          CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
          CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM ranked WHERE rk <= 300 GROUP BY source),
      totals AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM documents GROUP BY source)
      SELECT source, n_total, n_kept, chars_kept, id_sum
      FROM kept JOIN totals USING (source)
    """))

  /** INTER-ANNOTATOR AGREEMENT (Cohen's κ) — the label-quality gate a
    * data-annotation pipeline runs before trusting labels: two
    * independent binary annotators over the corpus (here the integer
    * quality-score rule ≥ 50 vs the length heuristic ≥ 250 chars — two
    * real heuristic labelers whose agreement is a meaningful number, not
    * a planted constant), their 2×2 confusion counts, observed agreement
    * p_o, chance agreement p_e from the marginals, and
    * κ = (p_o − p_e)/(1 − p_e). One aggregate over the scan (four
    * conditional counts); κ is double arithmetic over exact integers
    * written IDENTICALLY on both engines. Every marginal sum is cast to
    * double BEFORE the product (not after): the marginals themselves are
    * exact in int64 at any conceivable corpus size, but their product
    * overflows int64 past ~3e9 docs — double·double keeps the same
    * precision (the marginals stay < 2^53) with no overflow cliff. */
  lazy val q171AnnotatorKappa: Q = Q(
    "q171_annotator_kappa",
    (s, dir) => {
      val a = (graft.ext.TextStats.qualityScore(col("text"), stops) >= 50)
      val b = col("n_chars") >= 250
      val agg = t(s, dir, "documents")
        .select(a.as("a"), b.as("b"))
        .agg(count(lit(1)).as("n"),
          countIf(col("a") && col("b")).as("n11"),
          countIf(col("a") && !col("b")).as("n10"),
          countIf(!col("a") && col("b")).as("n01"),
          countIf(!col("a") && !col("b")).as("n00"))
      agg
        .withColumn("po",
          (col("n11") + col("n00")).cast("double") / col("n").cast("double"))
        .withColumn("pe",
          ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")).cast("double")
            + (col("n00") + col("n01")).cast("double") * (col("n00") + col("n10")).cast("double"))
            / (col("n").cast("double") * col("n").cast("double")))
        .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))
        .select("n", "n11", "n10", "n01", "n00", "po", "pe", "kappa")
    },
    Some(s"""
      WITH scored AS (
        SELECT
          (CAST((CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                  x -> x IN ($stopsSqlList))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.03 THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                  x -> length(x))) AS DOUBLE)
                / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
                THEN 25 ELSE 0 END)
            + (CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')) > 0.3 THEN 25 ELSE 0 END) AS INT)
            >= 50) AS a,
          (n_chars >= 250) AS b
        FROM documents),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          ${QueryDsl.oracleCountIf("a AND b")} AS n11,
          ${QueryDsl.oracleCountIf("a AND NOT b")} AS n10,
          ${QueryDsl.oracleCountIf("NOT a AND b")} AS n01,
          ${QueryDsl.oracleCountIf("NOT a AND NOT b")} AS n00
        FROM scored)
      SELECT n, n11, n10, n01, n00,
        CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
          + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
        (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        / (1.0e0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
              + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
      FROM agg
    """))

  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT (length-weighted corpus
    * subsample) — the Efraimidis–Spiridis A-ES order statistic in its
    * INTEGER-EXACT equivalent: instead of ranking docs by u^(1/w) (one
    * uniform, one cross-engine-fragile pow), rank by the MINIMUM of w
    * independent hash draws — P(min of w uniforms > x) = (1−x)^w, the
    * same order distribution, and with the catalog's portable modular
    * hash it is integer arithmetic end to end: the selected set is
    * EXACTLY reproducible on any engine, which float-pow A-ES cannot
    * promise (last-ulp pow flips near rank 200's boundary). Trade: the
    * draw explodes each doc by its weight — the right shape for small
    * integer weights (≤ 20 here; a 100 TB run with large weights would
    * switch to the pow form and accept approximate reproducibility).
    * One explode + keyed min + a TakeOrdered top-k: no global sort. */
  lazy val q178WeightedSample: Q = Q(
    "q178_weighted_sample",
    (s, dir) => {
      val P = 1000003L
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          least(expr("n_chars div 100") + 1, lit(20L)).as("w"))
        .select(col("doc_id"), col("source"), col("w"),
          explode(sequence(lit(1L), col("w"))).as("j"))
        .withColumn("h",
          pmod(pmod(col("doc_id") * (col("j") + 7), lit(P)) * lit(2654435761L), lit(P)))
        .groupBy(col("doc_id"), col("source"), col("w"))
        .agg(min(col("h")).as("k"))
        .orderBy(col("k"), col("doc_id")).limit(200)
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, source, LEAST(n_chars // 100 + 1, 20) AS w
        FROM documents),
      drawn AS (
        SELECT doc_id, source, w, unnest(generate_series(1, w)) AS j
        FROM docs),
      keyed AS (
        SELECT doc_id, source, w,
          CAST(MIN(((doc_id * (j + 7)) % 1000003 * 2654435761) % 1000003)
            AS BIGINT) AS k
        FROM drawn GROUP BY 1, 2, 3)
      SELECT doc_id, source, w, k
      FROM keyed ORDER BY k, doc_id LIMIT 200
    """))

  val all: Seq[Q] = Seq(
    q65Decontaminate, q66PackSequences, q68MixtureReweight, q69StratifiedSample,
    q70QualityFilter, q76ChunkDocuments, q89QualityCutoff, q91ClassSample,
    q97SourceOverlap, q101TemperatureMix, q116FuzzyDecontam, q178WeightedSample,
    q126ImportanceResample, q132BudgetMix, q160KfoldAssignment, q161DomainCap,
    q171AnnotatorKappa)

  /** K-FOLD CROSS-VALIDATION ASSIGNMENT — the evaluation-prep step after
    * the train/test splits (q64 hash, q153 temporal): every document
    * dealt into one of 5 folds by the engine-portable modular-BIGINT
    * hash (reproducible across runs, engines, and partitionings — the
    * q126/q149 recipe), with per-(fold, lang) counts and each fold's
    * share of its language proving the deal is stratification-neutral.
    * Pure projection + one grouped count; at any scale the fold id is a
    * free column, never a shuffle. */
  lazy val q160KfoldAssignment: Q = Q(
    "q160_kfold_assignment",
    (s, dir) => {
      // Reduce mod p, multiply, reduce mod p AGAIN, then fold to 5. The
      // previous ((id % p) * c) % 5 was degenerate: 2654435761 ≡ 1
      // (mod 5), so it collapsed to round-robin on the id, correlating
      // folds with any id pattern periodic in 5. The mod-p after the
      // multiply is what mixes (the q149 recipe); the mod-p BEFORE it
      // bounds the product at 1e6·2.65e9 ≈ 2.6e15, overflow-safe (ANSI)
      // for ANY doc_id, unlike multiplying the raw id (overflows > 3.4e9).
      val d = t(s, dir, "documents").withColumn("fold",
        pmod(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000003L)), lit(5L)))
      val byLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      d.groupBy(col("fold"), col("lang")).agg(count(lit(1)).as("n"))
        .join(broadcast(byLang), Seq("lang"))
        .withColumn("lang_share", col("n").cast("double") / col("n_lang"))
        .select(col("fold"), col("lang"), col("n"), col("n_lang"), col("lang_share"))
    },
    Some("""
      WITH d AS (
        SELECT lang, ((doc_id % 1000003) * 2654435761 % 1000003) % 5 AS fold FROM documents),
      by_lang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM d GROUP BY 1)
      SELECT fold, d.lang, CAST(COUNT(*) AS BIGINT) AS n, n_lang,
        CAST(COUNT(*) AS DOUBLE) / n_lang AS lang_share
      FROM d JOIN by_lang USING (lang)
      GROUP BY fold, d.lang, n_lang
    """))
}
