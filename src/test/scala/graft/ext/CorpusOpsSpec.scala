package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSuite {
  import spark.implicits._

  test("ngramOverlap counts distinct shared 3-grams against the benchmark set") {
    val train = Seq(
      (1L, "a b c d e"),        // 3-grams: abc bcd cde
      (2L, "x y z w v"),        // none shared
      (3L, "a b c x y")         // abc shared only
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c d q"),      // abc bcd + others
      (101L, "p q r s t")
    ).toDF("doc_id", "text")
    val got = CorpusOps.ngramOverlap(train, bench, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 3L)), 3L -> ((1L, 3L))),
      "doc1 shares {abc,bcd}/3; doc3 shares {abc}/3; doc2 absent (no match)")
  }

  test("ngramOverlap short docs fall back to the whole-text shingle") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b")).toDF("doc_id", "text")
    val got = CorpusOps.ngramOverlap(train, bench, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 1L, 1L, 1.0)))
  }

  test("packSequences assigns concat-and-chunk sequence ids and offsets") {
    // stream s: token counts 300, 300, 500 at budget 512:
    //   doc 1 starts at cum 0   -> seq 0 offset 0
    //   doc 2 starts at cum 300 -> seq 0 offset 300 (straddles into seq 1)
    //   doc 3 starts at cum 600 -> seq 1 offset 88
    val docs = Seq((1L, "s", 300L), (2L, "s", 300L), (3L, "s", 500L))
      .toDF("doc_id", "stream", "n")
    val got = CorpusOps.packSequences(docs, "stream", "doc_id", col("n"), 512)
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L)))
  }

  test("chunkDocuments: sliding windows with overlap, clamped tail, short-doc fallback") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, cs 4 / stride 3
      (2L, "a b")                                     // shorter than one chunk
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .as[(Long, Long, Seq[String])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // doc 1: k = ceil((10-4)/3) = 2 -> chunks at 0,3,6
    assert(got((1L, 0L)) === Seq("t1", "t2", "t3", "t4"))
    assert(got((1L, 1L)) === Seq("t4", "t5", "t6", "t7"), "stride 3 overlaps by 1")
    assert(got((1L, 2L)) === Seq("t7", "t8", "t9", "t10"))
    assert(got((2L, 0L)) === Seq("a", "b"), "short doc = one clamped chunk")
    assert(got.size === 4)
  }

  test("mixtureReweight computes shares and repeat factors") {
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).toDF("cls")
    val got = CorpusOps.mixtureReweight(df, "cls", Map("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a")._2 === 60L && got("a")._3 === 0.6)
    assert(got("a")._5 === 0.5 / 0.6)
    assert(got("b")._5 === 0.5 / 0.4)
  }

  test("hashSampled is deterministic, rate-monotone, and stable under growth") {
    val ids = (0L until 10000L).toDF("id")
    val n50 = ids.filter(CorpusOps.hashSampled(col("id"), 0.5)).count()
    val n10 = ids.filter(CorpusOps.hashSampled(col("id"), 0.1)).count()
    assert(math.abs(n50 - 5000L) < 500, s"~50% expected, got $n50")
    assert(math.abs(n10 - 1000L) < 300, s"~10% expected, got $n10")
    // rate-monotone: every 10% survivor also survives at 50% (hash < 100 < 500)
    val s10 = ids.filter(CorpusOps.hashSampled(col("id"), 0.1)).as[Long].collect().toSet
    val s50 = ids.filter(CorpusOps.hashSampled(col("id"), 0.5)).as[Long].collect().toSet
    assert(s10.subsetOf(s50))
    // incremental-ingest stability: the first 1000 ids' fate is unchanged
    // when the corpus grows (pure function of id)
    val small = (0L until 1000L).toDF("id")
      .filter(CorpusOps.hashSampled(col("id"), 0.5)).as[Long].collect().toSet
    assert(small === s50.filter(_ < 1000L))
  }

  test("budgetAllocation waterfills ascending with caps binding first") {
    val got = CorpusOps.budgetAllocation(
      Seq(("big", 1000L), ("small", 10L), ("mid", 100L)), budget = 300L)
    // ascending: small takes min(10, 300/3)=10; mid min(100, 290/2)=100;
    // big the remaining 190
    assert(got === Seq(("small", 10L, 10L), ("mid", 100L, 100L), ("big", 1000L, 190L)))
    assert(got.map(_._3).sum === 300L)
  }

  test("budgetAllocation: budget above total capacity caps every source") {
    val caps = Seq(("a", 50L), ("b", 70L))
    val got = CorpusOps.budgetAllocation(caps, budget = 1000L)
    assert(got.map(g => g._1 -> g._3).toMap === Map("a" -> 50L, "b" -> 70L))
  }

  test("budgetAllocation ties break by source name") {
    val got = CorpusOps.budgetAllocation(Seq(("y", 10L), ("x", 10L)), budget = 11L)
    // x first: min(10, 11/2)=5; y: min(10, 6/1)=6
    assert(got === Seq(("x", 10L, 5L), ("y", 10L, 6L)))
  }

  test("budgetedSelect never exceeds a source's allocation and is deterministic") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "s_big" else if (i % 3 == 1) "s_mid" else "s_small",
        "w " * (i % 7 + 1).toInt))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.budgetedSelect(docs, "source",
      size(split(col("text"), " ")), "doc_id", budgetPct = 40)
      .as[(String, Long, Long, Long, Long)].collect()
    for ((_, cap, alloc, _, tokSel) <- out) {
      assert(tokSel <= alloc && alloc <= cap)
    }
    val again = CorpusOps.budgetedSelect(docs.repartition(7), "source",
      size(split(col("text"), " ")), "doc_id", budgetPct = 40)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq === again.toSeq)
  }
}
