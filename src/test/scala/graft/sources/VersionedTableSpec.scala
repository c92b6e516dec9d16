package graft.sources

import graft.SparkSuite

class VersionedTableSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-vt").toString

  test("commit marker guard: second creation of the same version fails") {
    val base = tmp() + "/vt-guard"
    val v = VersionedTable.commit(spark, base, Seq((1, "a")).toDF("k", "v"))
    assert(v === 0L)
    // A racing committer that computed the same next version lands here
    // after its data write; the create(overwrite=false) guard must refuse.
    // (rename-based markers silently replace on local FS — both racers
    // would have reported success.)
    val ex = intercept[java.io.IOException](
      VersionedTable.createMarker(spark, base, 0L, "racer"))
    assert(ex.getMessage.contains("already exists"))
    // the losing attempt must not have clobbered the winner's history
    val h = VersionedTable.history(spark, base)
      .select("version", "operation").as[(Long, String)].collect()
    assert(h.toSeq === Seq((0L, "commit")))
  }
}
