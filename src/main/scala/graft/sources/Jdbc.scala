package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's `DBInputFormat`/`DBOutputFormat`
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/db/DBInputFormat.java:49,87-115`,
  * `DBOutputFormat.java`): map tasks each read one LIMIT/OFFSET slice of a
  * SELECT, reduce output is batched INSERTs.
  *
  * Spark-first: `spark.read.jdbc` with a numeric `partitionColumn` gives
  * each task a WHERE-range slice instead of LIMIT/OFFSET (range predicates
  * use the table's index; OFFSET n forces the database to skip n rows per
  * split — O(rows²) across splits, which is why DBInputFormat was slow on
  * big tables). Writes go through `df.write.jdbc` (batched prepared
  * INSERTs, `DBOutputFormat.getRecordWriter` semantics).
  *
  * The demo engine is embedded Derby (ships with Spark for the Hive
  * metastore); any JDBC URL works the same way.
  */
object Jdbc {

  /** Derby's embedded driver, loaded lazily exactly once. */
  private lazy val derbyLoaded: Boolean = {
    // keep Derby's log out of the repo cwd
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    true
  }

  private def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Boot (or create) a fresh embedded Derby database at `dbDir`,
    * discarding any previous on-disk state: shut the engine's handle on it
    * down first (a live embedded db must not have its files deleted from
    * under it), then remove the directory.
    */
  def freshDerby(dbDir: String): String = {
    require(derbyLoaded)
    try DriverManager.getConnection(s"jdbc:derby:$dbDir;shutdown=true")
    catch { case _: java.sql.SQLException => () } // 08006 = successful shutdown
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dbDir))
    s"jdbc:derby:$dbDir;create=true"
  }

  /** DBOutputFormat analog: batched INSERTs, table replaced. */
  def write(df: DataFrame, url: String, table: String): Unit = {
    require(derbyLoaded)
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props())
  }

  /** DBInputFormat analog: read `table` split into `numPartitions` range
    * slices of the numeric `partitionColumn`. Bounds are fetched with one
    * 1-row min/max query (the DBInputFormat COUNT(*) planning query
    * analog); pushed filters (`df.where`) become WHERE clauses in each
    * slice's SELECT — verify with `.explain` → `PushedFilters`.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, numPartitions: Int): DataFrame = {
    require(derbyLoaded)
    // quote the column: Spark's JDBC writer creates case-exact quoted
    // identifiers, which Derby would otherwise fold to uppercase
    val qc = "\"" + partitionColumn + "\""
    val bounds = spark.read.jdbc(
      url, s"(SELECT MIN($qc) mn, MAX($qc) mx FROM $table) b",
      props()).head()
    def asLong(i: Int): Long = bounds.get(i).asInstanceOf[Number].longValue
    spark.read.jdbc(url, table, partitionColumn,
      asLong(0), asLong(1), numPartitions, props())
  }

  /** Plain (single-split) read — small dimension tables. */
  def read(spark: SparkSession, url: String, table: String): DataFrame = {
    require(derbyLoaded)
    spark.read.jdbc(url, table, props())
  }
}
