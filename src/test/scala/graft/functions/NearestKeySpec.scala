package graft.functions

import graft.SparkSuite
import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r18 fused [[NearestKey]] assignment/encode paths bit-equal to
  * the pre-r18 cross-product + ArgExtremum + re-attach shapes they
  * replaced (the DuckDB oracles of q88/q92/q117/q120+/q136+ all encode the
  * OLD shape's semantics, so equality here is what keeps them green). */
class NearestKeySpec extends SparkSuite {
  import spark.implicits._

  private def corpus(n: Int, d: Int): DataFrame = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong,
      Seq.fill(d)((rnd.nextInt(2001) - 1000) / 512.0))).toDF("id", "vec")
  }

  private def cents(c: DataFrame, every: Int): DataFrame =
    c.filter(col("id") % every === 0)
      .select(col("id").cast("int").as("cid"), col("vec").as("cvec"))

  /** The pre-r18 assignNearestCentroid (cosine argmax + re-attach). */
  private def oldAssign(c: DataFrame, k: DataFrame): DataFrame =
    c.crossJoin(broadcast(k))
      .select(col("id"), col("cid"),
        Similarity.cosine(col("vec"), col("cvec")).as("sim_c"))
      .groupBy(col("id"))
      .agg(ArgExtremum.argmax(col("cid").cast("long"), col("sim_c"))
        .cast(k.schema("cid").dataType).as("cid"))
      .join(c, Seq("id"))
      .select(col("id"), col("cid"), col("vec"))

  /** The pre-r18 kmeansAssign (sqdist argmin + min + re-attach). */
  private def oldKmeans(c: DataFrame, k: DataFrame): DataFrame =
    c.crossJoin(broadcast(k))
      .select(col("id"), col("cid"), Similarity.sqDist(col("vec"), col("cvec")).as("d2"))
      .groupBy(col("id"))
      .agg(ArgExtremum.argmin(col("cid").cast("long"), col("d2"))
          .cast(k.schema("cid").dataType).as("cluster"),
        min(col("d2")).as("d2"))
      .join(c, Seq("id"))
      .select(col("id"), col("cluster"), col("d2"), col("vec"))

  test("fused assignNearestCentroid ≡ crossJoin+argmax+reattach (incl. zero-norm NaN rows)") {
    val base = corpus(400, 8)
    // a zero vector makes every cosine NaN -> old argmax yields null cid
    val c = base.unionByName(Seq((9999L, Seq.fill(8)(0.0))).toDF("id", "vec"))
    val k = cents(base, 25)
    val got = Similarity.assignNearestCentroid(c, k)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val want = oldAssign(c, k)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got === want)
    assert(want(9999L).isEmpty, "all-NaN row must keep a null cid on both paths")
  }

  test("fused kmeansAssign ≡ crossJoin+argmin+min+reattach, d2 bit-equal") {
    val c = corpus(300, 8)
    val k = cents(c, 20)
    val got = Similarity.kmeansAssign(c, k)
      .collect().map(r => (r.getLong(0), (r.get(1), r.getDouble(2)))).toMap
    val want = oldKmeans(c, k)
      .collect().map(r => (r.getLong(0), (r.get(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("fused pqEncode ≡ explode+argmin+regroup, every code equal") {
    val c = corpus(200, 12)
    val books = Similarity.pqCodebooks(c, m = 3, ksub = 8, iters = 1)
    val got = Similarity.pqEncode(c, books, m = 3)
      .as[(Long, Seq[Int])].collect().toMap
    // pre-r18 shape, inlined
    val parts = c.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(2)),
        s => slice(col("vec"), s * lit(4) + 1, lit(4)))).as(Seq("subspace", "sub")))
    val want = parts.join(broadcast(books), Seq("subspace"))
      .withColumn("d2", Similarity.sqDist(col("sub"), col("cvec")))
      .groupBy(col("id"), col("subspace"))
      .agg(ArgExtremum.argmin(col("cid").cast("long"), col("d2"))
        .cast("int").as("code"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("code")))),
        x => x.getField("code")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got === want)
  }

  test("NearestKey ties break to the smallest key in any candidate order") {
    // two identical centroids with different ids: the smaller id must win,
    // whether it appears first or last in the candidate array
    val v = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "vec")
    for (order <- Seq(Seq(7L, 3L), Seq(3L, 7L))) {
      val cands = array(order.map(k =>
        struct(lit(k).as("k"), array(lit(1.0), lit(2.0), lit(3.0)).as("cv"))): _*)
      val got = v.select(NearestKey.nearestByCosine(col("vec"), cands)
        .getField("key")).head.getLong(0)
      assert(got === 3L, s"order $order")
    }
  }

  test("float corpus vectors and float candidate vectors both supported") {
    val cf = Seq((1L, Seq(0.5f, -1.25f)), (2L, Seq(2.0f, 0.25f)))
      .toDF("id", "vec")
    val kf = Seq((0, Seq(0.5f, -1.0f)), (1, Seq(2.0f, 0.5f))).toDF("cid", "cvec")
    val got = Similarity.assignNearestCentroid(cf, kf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val want = oldAssign(cf, kf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === want)
  }
}
