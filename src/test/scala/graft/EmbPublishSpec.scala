package graft

import org.scalatest.funsuite.AnyFunSuite

/** emb_ivfpq_published's blue/green contract:
  *   1. the publish history ends at v3 (the retrained epoch) and the
  *      query's answer carries that version;
  *   2. versions are LOGICAL — publishing v3 moves no bytes: the v1
  *      AND v2 artifact directories keep their exact file sets;
  *   3. rollback = republishing v1's manifest, after which the SAME
  *      query serves the as-built index row-identically to
  *      emb_ivfpq_served (plus version 1);
  *   4. the swap is a single manifest rename: no .tmp residue, and
  *      the manifest parses to the paths it was published with.
  */
class EmbPublishSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def indexRoot: String = {
    val h = java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
    val pid = ProcessHandle.current().pid()
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivfpq_${pid}_$h").toString
  }

  private def filesOf(sub: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(indexRoot, sub))
      .map(f => f.getAbsolutePath -> f.length()).toMap
  }

  test("blue/green publish: v3 served, v1/v2 immutable, atomic rollback") {
    val rows = Registry.byName("emb_ivfpq_published").build(spark, dir)
      .collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Int]("version") == 3))

    val root = indexRoot
    val (v, centPath, codesPath) =
      queries.EmbQueries.readManifest(spark, root)
    assert(v == 3)
    assert(centPath.endsWith("centroids_rt"))
    assert(codesPath.endsWith("codes_rt"))
    // no torn/temporary manifest state left behind
    val residue = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.startsWith("MANIFEST") && n != "MANIFEST.json")
    assert(residue.isEmpty, s"manifest residue: ${residue.toSeq}")

    // v1 and v2 artifacts untouched by building/publishing v3 (logical
    // versions move no bytes): snapshot, republish v3, re-snapshot
    val v1CodesBefore = filesOf("codes")
    val v1CentBefore = filesOf("centroids")
    val v2CodesBefore = filesOf("codes_reb")
    val v2CentBefore = filesOf("centroids_reb")
    queries.EmbQueries.publishVersion(spark, root, 3,
      s"$root/centroids_rt", s"$root/codes_rt")
    assert(filesOf("codes") == v1CodesBefore)
    assert(filesOf("centroids") == v1CentBefore)
    assert(filesOf("codes_reb") == v2CodesBefore)
    assert(filesOf("centroids_reb") == v2CentBefore)

    // ROLLBACK: republish v1; the same query now serves the as-built
    // index, row-identical to emb_ivfpq_served
    queries.EmbQueries.publishVersion(spark, root, 1,
      s"$root/centroids", s"$root/codes")
    val (v1, c1, k1) = queries.EmbQueries.readManifest(spark, root)
    assert(v1 == 1 && c1.endsWith("centroids") && k1.endsWith("codes"))
    val rolled = Registry.byName("emb_ivfpq_published").build(spark, dir)
      .collect()
    assert(rolled.forall(_.getAs[Int]("version") == 1))
    val served = Registry.byName("emb_ivfpq_served").build(spark, dir)
      .select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rolledPairs = rolled
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    assert(rolledPairs == served, s"rolled=$rolledPairs served=$served")

    // leave the published state at v3 — the oracle's pinned version
    queries.EmbQueries.publishVersion(spark, root, 3,
      s"$root/centroids_rt", s"$root/codes_rt")
    assert(queries.EmbQueries.readManifest(spark, root)._1 == 3)
  }
}
