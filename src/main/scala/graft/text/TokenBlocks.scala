package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

/** Token-block batching — the concat-and-chunk training-batch layout:
  * documents are laid end to end (separator tokens included in the
  * caller's weight) in a deterministic global order, and the resulting
  * token stream is cut into fixed-size blocks of `blockTokens`. A doc
  * whose span crosses a block boundary contributes a slice to each block
  * it touches — blocks are always exactly full (except the last), the
  * shape a fixed-context training loader consumes.
  *
  * No reference analog (the reference era stopped at record-shaped IO);
  * this is the training-data value-add the build brief mandates, composed
  * from the same distributed machinery as the epoch shuffle: the global
  * token offset is [[GlobalRank.withGlobalCumSum]] (two-level prefix sum,
  * never a single-partition window), over the md5-of-key order that
  * [[graft.ops.Sampling.splitAssign]] and the epoch shuffle also use —
  * deterministic, growth-stable, and independent of input partitioning.
  */
object TokenBlocks {

  /** Per-document global token span and block range.
    *
    * @param weight token cost of each doc INCLUDING any separator (pass
    *               `tokenCount(text) + 1` for an EOS-separated stream);
    *               must be >= 1 so every doc owns at least one token.
    * @return (keyCol, w, start, first_block, last_block) — `start` is the
    *         doc's global token offset, blocks are `start div L` through
    *         `(start + w - 1) div L`.
    */
  def assign(df: DataFrame, keyCol: String, weight: Column,
             blockTokens: Long): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be > 0, got $blockTokens")
    val narrow = df.select(col(keyCol), weight.cast("long").as("w"))
    val order = Seq(md5(col(keyCol).cast("string")), col(keyCol))
    GlobalRank.withGlobalCumSum(narrow, order, "w", cumCol = "start")
      // integer `div`, not floating /: offsets at corpus scale must not
      // round through a double
      .withColumn("first_block", expr(s"start div $blockTokens"))
      .withColumn("last_block", expr(s"(start + w - 1) div $blockTokens"))
  }

  /** Exploded block manifest — one row per (block, doc-slice): which span
    * of each block each document fills. `off_in_block` is the slice's
    * position inside the block, `len` its token count; per block the
    * slices tile [0, blockTokens) exactly (the trailing block may be
    * short). Pure Column 1→N from [[assign]]'s output — stays in the
    * same stage, no further shuffle.
    */
  def manifest(assigned: DataFrame, blockTokens: Long): DataFrame = {
    val bStart = col("block_id") * blockTokens
    val bEnd = (col("block_id") + 1) * blockTokens
    assigned
      .withColumn("block_id",
        explode(sequence(col("first_block"), col("last_block"))))
      .withColumn("off_in_block", greatest(col("start") - bStart, lit(0L)))
      .withColumn("len",
        least(col("start") + col("w"), bEnd) - greatest(col("start"), bStart))
      .drop("first_block", "last_block")
  }
}
