package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NewsSources

/** S2/S3/S4 source semantics: explicit schema, DROPMALFORMED skip,
  * heterogeneous-directory union with null backfill.
  */
class NewsSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("src_fixture").toFile
    Files.write(new java.io.File(d, "full.json").toPath,
      ("""{"id":"1","title":"t1","description":"d1","url":"u","publishedAt":"p","lang":"en","fetched_at":"f"}""" +
        "\n" + """{"id":"2","title":"t2","description":"d2"}""")
        .getBytes("UTF-8"))
    Files.write(new java.io.File(d, "sparse.json").toPath,
      """{"id":"3","lang":"fr"}""".getBytes("UTF-8"))
    Files.write(new java.io.File(d, "broken.json").toPath,
      ("""{"id":"4","title":"ok"}""" + "\n" + """{"id":"5", BROKEN""")
        .getBytes("UTF-8"))
    d.getAbsolutePath
  }

  test("S3 lenient read drops only malformed lines") {
    val df = NewsSources.readLenient(spark, s"$dir/broken.json")
    assert(df.collect().map(_.getAs[String]("id")).toSeq == Seq("4"))
  }

  test("S4 directory union backfills missing columns with null") {
    val df = NewsSources.readDirUnion(spark, dir)
    assert(df.columns.length == 9)
    val byId = df.collect().map(r => r.getAs[String]("id") -> r).toMap
    // sparse row: absent fields are null, present ones survive
    assert(byId("3").getAs[String]("lang") == "fr")
    assert(byId("3").getAs[String]("title") == null)
    assert(byId("1").getAs[String]("description") == "d1")
    assert(byId.contains("4"))
  }
}
