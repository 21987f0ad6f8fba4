package graft.zip

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

/** Edge cases from SURVEY.md §7.6: oversized entries (maxBodyBytes guard),
  * non-ASCII entry names, zip64 archives (entry count past the 65535
  * classic-format limit), plus the SQL registration of the native
  * functions. */
class ZipRobustnessSpec extends SparkSpec {

  private lazy val dir: File = {
    val d = Files.createTempDirectory("graft_robust").toFile
    d.deleteOnExit()
    d
  }

  test("vec_dot is SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
    // mixed types: float column vs long literal array
    val r2 = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT)), array(2L)) AS d")
      .collect()(0).getDouble(0)
    assert(r2 == 3.0)
  }

  test("maxBodyBytes guards against oversized entries") {
    val f = new File(dir, "big.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    z.putNextEntry(new ZipEntry("big.bin"))
    z.write(new Array[Byte](4096))
    z.closeEntry(); z.close()
    val cfg = ZipToParquetConfig(inputs = Seq(f.getAbsolutePath), maxBodyBytes = 100)
    val e = intercept[Exception] {
      ZipExtract.entries(spark, cfg).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("maxBodyBytes")))
  }

  test("non-ASCII UTF-8 entry names round-trip") {
    val f = new File(dir, "utf8.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    val names = Seq("café/résumé.txt", "数据/文件.bin")
    names.foreach { n =>
      z.putNextEntry(new ZipEntry(n)); z.write("x".getBytes); z.closeEntry()
    }
    z.close()
    val got = ZipExtract.entries(spark,
      ZipToParquetConfig(inputs = Seq(f.getAbsolutePath)))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == names.sorted)
  }

  test("zip64: archives with more than 65535 entries extract completely") {
    val f = new File(dir, "many.zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    val n = 70000
    var i = 0
    while (i < n) {
      z.putNextEntry(new ZipEntry(s"e$i"))
      z.closeEntry()
      i += 1
    }
    z.close()
    // names-only config → central-directory-style pass, no body reads
    val cfg = ZipToParquetConfig(inputs = Seq(f.getAbsolutePath),
      includeBody = false, includeHash = false)
    assert(ZipExtract.entries(spark, cfg).count() == n)
  }
}
