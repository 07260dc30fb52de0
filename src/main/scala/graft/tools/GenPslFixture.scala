package graft.tools

import graft.GraftSession

/** Writes the parsed Public Suffix List rule table to
  * `fixtures/psl_rules.parquet` (ONE plain parquet file, committed to
  * the repo) — the DuckDB oracle's side of [[graft.text.Urls
  * .registeredDomainsPsl]]: the oracle replays the same candidate
  * generation and longest-match aggregation over this table, so the
  * fixture must stay bit-identical to what the library parses from its
  * classpath resource (UrlsSpec asserts exactly that).
  * Usage: dev/run.sh graft.tools.GenPslFixture
  */
object GenPslFixture {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-psl-fixture", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rules = graft.text.Urls.pslRules
    val tmp = java.nio.file.Files.createTempDirectory("psl_fixture").toString
    rules.toDF("rkey", "rlabels", "rexc").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dest = java.nio.file.Paths.get("fixtures/psl_rules.parquet")
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${rules.size} rules to $dest")
    spark.stop()
  }
}
