package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.dedup.Dedup

/** Streaming NEAR-dup ingest (r14 verdict stretch): the crawl front
  * door's stateless ingest composed with the batch-incremental near-dup
  * pass, so a CONTINUOUS ingest dedups in-stream instead of staging
  * batches for `Dedup.incrementalNearDups` replays.
  *
  * Shape: the scalar dedup keys ([[Dedup.minhashBandKeys]] — the
  * `graft_minhash_bands` surface) ride the scan, `posexplode` turns them
  * into (band, bkey) rows, and a `flatMapGroupsWithState` keyed on the
  * band bucket holds the documents previously seen in that bucket. Each
  * arriving doc is Jaccard-verified against the bucket's state and the
  * verified pairs stream out append-mode; the arrival then joins the
  * state so later micro-batches dedup against it.
  *
  * Stream ≡ batch: with history in micro-batch 1 and a new batch in
  * micro-batch 2 (checkpointed AvailableNow runs), the emitted pairs are
  * exactly `Dedup.incrementalNearDups(batch, history)` — same banding,
  * same bucket-eligibility ceiling, same ≥ threshold verification —
  * certified by q_stream_neardup's DuckDB oracle and the
  * EventStreamsSpec equivalence. The one deliberate difference: the
  * verify intersects distinct 60-bit SHINGLE HASHES (what the state can
  * afford to hold — 8 bytes per shingle) rather than shingle strings;
  * the oracle replays the identical hash-set arithmetic.
  *
  * Scale: state per bucket is CAPPED — once a bucket accumulates more
  * than `maxBucket` documents it is poisoned (stored size pins at
  * maxBucket + 1, matching arrivals stop matching) exactly like the
  * history-side `okBuckets` ceiling in [[Dedup.incrementalNearDups]]:
  * corpus-wide boilerplate buckets must not hold O(corpus) state or
  * emit O(n²) pairs. Everything else is one shuffle (the groupByKey on
  * (band, bkey)) per micro-batch, and the per-pair verify touches only
  * same-bucket docs. Reference shape being re-expressed: the reference
  * engine's streaming dedup staging (mapred job chains over
  * SequenceFile batches) — here the state store IS the published band
  * table.
  */
object StreamDedup {

  /** One (band, bucket) arrival: the doc and its distinct shingle-hash
    * set (sorted array — Datasets need a concrete encodable field).
    */
  case class BandedDoc(band: Int, bkey: String, docId: Long,
                       shingles: Array[Long])

  /** Bucket state: (docId, shingle hashes) for every doc seen in this
    * bucket, capped at maxBucket + 1 entries (the +1 pins "over the
    * ceiling" without unbounded growth).
    */
  case class BucketState(docs: List[(Long, Array[Long])])

  /** A verified near-dup emission: `newId` arrived after `histId`. */
  case class NearDupPair(batch_id: Long, hist_id: Long, jaccard: Double)

  /** Exact Jaccard over two distinct-hash sets, rounded at 6 digits with
    * HALF_UP — bit-identical to [[Dedup.ngramJaccard]]'s
    * `round(inter / (szA + szB - inter), 6)` column arithmetic.
    */
  private[streaming] def jaccard(a: Set[Long], b: Set[Long]): Double = {
    val inter = a.count(b.contains)
    val denom = a.size + b.size - inter
    if (denom <= 0) 0.0
    else BigDecimal(inter.toDouble / denom)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Verified near-dup pairs from a STREAMING `(doc_id, text)` frame.
    * Arrivals match only docs from EARLIER micro-batches (bucket state),
    * never their own batch — so two checkpointed AvailableNow runs
    * (history file, then batch file) reproduce
    * `incrementalNearDups(batch, history)` pair for pair. Within one
    * micro-batch, arrivals enter the state in doc-id order, so the
    * capped state's membership is deterministic regardless of task
    * scheduling.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8,
                   numPerms: Int = 8, rowsPerBand: Int = 2,
                   shingleN: Int = 3,
                   maxBucket: Int = 1000): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .select(col("doc_id").cast("long").as("docId"),
        // distinct 60-bit shingle hashes, sorted: the verify SET
        array_sort(array_distinct(transform(
          array_distinct(Dedup.shingles(col("text"), shingleN)),
          s => Dedup.shingleHash(s)))).as("shingles"),
        // NULL band keys (null/empty text) posexplode to no rows —
        // matching the batch path, where such docs get no signature row
        posexplode(Dedup.minhashBandKeys(col("text"), numPerms,
          rowsPerBand, shingleN)))
      .select(col("pos").as("band"), col("col").as("bkey"),
        col("docId"), col("shingles"))
      .as[BandedDoc]
    banded
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val st = state.getOption.getOrElse(BucketState(Nil))
          // doc-id order: deterministic emissions AND deterministic cap
          // membership within a micro-batch
          val arrivals = rows.toSeq.sortBy(_.docId)
          // bucket eligible ⇔ history size ≤ maxBucket — the okBuckets
          // ceiling of the batch formulation
          val out =
            if (st.docs.isEmpty || st.docs.size > maxBucket) Seq.empty
            else for {
              a <- arrivals
              (hid, hsh) <- st.docs
              j = jaccard(a.shingles.toSet, hsh.toSet)
              if j >= threshold
            } yield NearDupPair(a.docId, hid, j)
          // append arrivals (they are history for LATER batches), capped
          // at maxBucket + 1 so a boilerplate bucket stays poisoned at
          // O(maxBucket) state instead of growing with the stream
          val room = maxBucket + 1 - st.docs.size
          if (room > 0)
            state.update(BucketState(
              st.docs ::: arrivals.take(room)
                .map(a => (a.docId, a.shingles)).toList))
          out.iterator
      }
  }
}
