package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking — the reference's `TotalOrderPartitioner` +
  * per-reducer position counting
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/TotalOrderPartitioner.java:41`,
  * sampler `lib/InputSampler.java:49`).
  *
  * `row_number() OVER (ORDER BY ...)` forces a SinglePartition exchange —
  * one task ranks everything, which cannot scale. This operator keeps the
  * computation distributed: range-repartition on the sort key (Spark
  * samples split points, exactly like InputSampler), sort within
  * partitions, then `zipWithIndex` (one lightweight count job for the
  * per-partition offsets) assigns contiguous global ranks.
  *
  * The sort key must be a unique total order for ranks to be
  * deterministic (add an id tie-break, as the reference's total sorts
  * required byte-unique keys).
  */
object GlobalRank {

  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1))
    }
    spark.createDataFrame(ranked, outSchema)
  }
}
