package graft.ext

import graft.SparkSuite

class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  // forceLoop=0 edges disables the driver union-find gate so the
  // distributed label-propagation path is what's under test
  private val ForceLoop = 0L

  test("connected components: chains, triangles, singletons (both paths)") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (singleton)
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L)).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a", "b")
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L)
    val fast = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    val loop = Components.connectedComponents(nodes, edges, smallGraphMaxEdges = ForceLoop)
      .as[(Long, Long)].collect().toMap
    assert(fast === want)
    assert(loop === want)
  }

  test("empty graph yields empty result (no NPE on null sum)") {
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(nodes, edges).count() === 0L)
    assert(Components.connectedComponents(
      nodes, edges, smallGraphMaxEdges = ForceLoop).count() === 0L)
  }

  test("long path converges in O(log diameter) rounds (pointer jumping)") {
    val n = 30
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    // maxIter=8 ≪ diameter 29: only the pointer jump makes this converge —
    // plain neighbor-min propagation would need 29 rounds and fail here.
    // smallGraphMaxEdges=0 keeps the driver union-find out of the way.
    val got = Components.connectedComponents(
      nodes, edges, maxIter = 8, smallGraphMaxEdges = ForceLoop)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L), "one path = one component rooted at 0")
  }

  test("reliable checkpointing is an explicit opt-in; engaged, it writes to the dir") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite assumes no pre-set checkpoint dir")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ck")
    sc.setCheckpointDir(dir.toString)
    def fileCount(p: java.io.File): Long =
      if (p.isDirectory) p.listFiles().map(fileCount).sum else 1L
    val nodes = (0L until 30L).toDF("id")
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val want = (0L until 30L).map(_ -> 0L).toMap
    try {
      // a configured dir ALONE must not flip the mode (an unrelated global
      // setting would otherwise silently convert every CC query to the
      // 2-jobs-per-round durable path): no conf flag -> no files written
      val localGot = Components.connectedComponents(nodes, edges,
        smallGraphMaxEdges = ForceLoop).as[(Long, Long)].collect().toMap
      assert(localGot === want)
      assert(fileCount(dir.toFile) === 0,
        "without the opt-in conf, rounds must stay block-manager-local")
      // opted in: same labels, and the rounds' reliable files land in the dir
      spark.conf.set("graft.cc.reliableCheckpoint", "true")
      val got = Components.connectedComponents(nodes, edges,
        smallGraphMaxEdges = ForceLoop).as[(Long, Long)].collect().toMap
      assert(got === want)
      assert(fileCount(dir.toFile) > 0,
        "opted in, the configured dir must receive the rounds' reliable checkpoints")
    } finally {
      spark.conf.unset("graft.cc.reliableCheckpoint")
      sc.setCheckpointDir(null) // public-API unset: Option(null) => None
      assert(sc.getCheckpointDir.isEmpty)
      // don't litter the system temp dir with per-round snapshots
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("driver union-find and distributed loop agree on a random graph") {
    val rng = new scala.util.Random(42)
    val n = 400
    val nodes = (0L until n.toLong).toDF("id")
    // sparse random graph: ~n*0.7 edges → a mix of multi-node components
    // and singletons; plus one long chain to exercise deep connectivity
    val rand = Seq.fill((n * 0.7).toInt)(
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val chain = (300L until 399L).map(i => (i, i + 1))
    val edges = (rand ++ chain).toDF("a", "b")
    val fast = Components.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    val loop = Components.connectedComponents(nodes, edges, smallGraphMaxEdges = ForceLoop)
      .as[(Long, Long)].collect().toMap
    assert(fast === loop)
    assert(fast.size === n)
  }
}
