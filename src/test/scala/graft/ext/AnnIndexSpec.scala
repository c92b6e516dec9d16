package graft.ext

import graft.{SparkSuite, Tables}
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Lifecycle of the persisted IVF×PQ artifact ([[AnnIndex]]) beyond the
  * streaming-ingest path StreamingSpec covers: retrain generations,
  * backfill, and vacuum.
  */
class AnnIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-annidx").toString

  test("retrain opens an isolated generation; backfill == rebuild; vacuum drops only old data") {
    val base = tmp() + "/ann"
    val emb = Tables.load(spark, sf("e"), "embeddings")
    val corpus = emb.select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"cid", $"codes").as[(Long, Long, Seq[Int])].collect().toSet

    // generation 0: train + single-batch ingest + search
    val gen0 = AnnIndex.train(spark, base, corpus, nCentroids = 8, m = 4, ksub = 16)
    assert(gen0 === 0L)
    AnnIndex.extendBatch(spark, base, corpus, batchId = 0L)
    val queries = corpus.filter($"id" < 5)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val s0 = AnnIndex.search(spark, base, queries, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(s0.nonEmpty)

    // RETRAIN with different quantizers (coarser: 4 lists). The new
    // generation starts EMPTY — reads against it must fail loudly, not
    // silently serve generation-0 codes encoded with the wrong books.
    val gen1 = AnnIndex.train(spark, base, corpus, nCentroids = 4, m = 4, ksub = 16)
    assert(gen1 === gen0 + 1)
    intercept[Exception] { AnnIndex.readIndex(spark, base).collect() }
    // generation-0 artifacts are untouched by the retrain (snapshot
    // isolation: a reader pinned to quantizer v0 still has its data)
    assert(VersionedTable.readVersion(spark, s"$base/quantizer", gen0)
      .filter($"kind" === "centroid").count() === 8)

    // BACKFILL generation 1 in two batches; extension == rebuild means
    // the result must equal a from-scratch encode with gen-1 quantizers
    AnnIndex.extendBatch(spark, base, corpus.filter($"id" % 2 === 0), 0L)
    AnnIndex.extendBatch(spark, base, corpus.filter($"id" % 2 === 1), 1L)
    val (_, cents1, books1, m1) = AnnIndex.quantizer(spark, base)
    assert(rows(AnnIndex.readIndex(spark, base)) ===
      rows(Similarity.ivfPqResidualEncode(corpus, cents1, books1, m1)),
      "backfilled generation must equal a from-scratch rebuild")
    val s1 = AnnIndex.search(spark, base, queries, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(s1 === Similarity.ivfPqResidualTopK(
        Similarity.ivfPqResidualEncode(corpus, cents1, books1, m1),
        cents1, books1, queries, m1, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet)

    // VACUUM: generation-0 shards and quantizer-v0 DATA go; the current
    // generation and the quantizer history stay
    AnnIndex.vacuum(spark, base)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/gen=0")),
      "old generation's shards must be dropped")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/index/gen=1")))
    val hist = VersionedTable.history(spark, s"$base/quantizer")
      .select($"version", $"available").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(hist.toSeq === Seq((0L, false), (1L, true)),
      "quantizer history must survive vacuum with v0 marked unavailable")
    // post-vacuum search still serves the current generation
    assert(AnnIndex.search(spark, base, queries, k = 10, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet === s1)
  }
}
