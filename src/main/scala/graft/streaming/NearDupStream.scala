package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.DedupOps

/** One (band, bucket) membership row for a document. */
case class BucketDoc(band: Int, bh: Long, docId: Long)

/** A streaming near-dup candidate: `doc_id` landed in a band bucket whose
  * representative (first-seen doc) is `rep_id`.
  */
case class CandidateLink(doc_id: Long, band: Int, bh: Long, rep_id: Long)

/** Streaming MinHash-LSH candidate generation: the unbounded-feed analog
  * of [[graft.ops.DedupOps.minhashLshCandidates]].
  *
  * Shape: signatures and band buckets are ROW-LOCAL (codegen'd
  * `ShingleMinHash` + one explode — exactly the batch path), then ONE
  * stateful operator keyed by (band, bucket) holds the bucket's
  * representative: the first document ever seen there (8 B of state per
  * non-empty bucket). Every later arrival emits a [[CandidateLink]] to
  * that representative — so each near-dup candidate is linked the moment
  * it arrives, and exact verification (the batch verify join) runs
  * downstream on candidates only.
  *
  * Contract differences vs the batch op, by design:
  *   - links are STAR-shaped per bucket (everyone -> first-seen), not all
  *     pairs: for dedup-filtering every non-representative doc still gets
  *     >= 1 link, which is what the drop/verify decision needs, and state
  *     stays O(1) per bucket instead of O(members).
  *   - the representative is arrival-order-dependent (ties within a
  *     micro-batch break by lowest doc id). Feed ids in order and it is
  *     the batch `min(doc_id)` per bucket — asserted streamed==batch in
  *     NearDupStreamSpec.
  *
  * State is unbounded in the number of distinct buckets (that IS the
  * index); cap it for endless feeds by restarting per corpus epoch or
  * swapping `NoTimeout` for a processing-time timeout to expire idle
  * buckets.
  */
object NearDupStream {

  def lshCandidateLinks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): Dataset[CandidateLink] = {
    require(numHashes % bands == 0, s"bands must divide numHashes")
    val session = docs.sparkSession
    import session.implicits._
    val sigs = DedupOps.minhashSignatures(docs, idCol, textCol, k, numHashes)
    val buckets = DedupOps.bandBuckets(sigs, bands, numHashes / bands)
      .select(col("band"), col("bh"), col("doc_id").as("docId"))
      .as[BucketDoc]
    buckets
      .groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState[Long, CandidateLink](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[BucketDoc], state: GroupState[Long]) =>
          val (band, bh) = key
          // lowest id first within the batch -> deterministic representative
          val sorted = rows.toSeq.sortBy(_.docId)
          var out = List.empty[CandidateLink]
          sorted.foreach { r =>
            state.getOption match {
              case None => state.update(r.docId)
              case Some(rep) if r.docId != rep =>
                out = CandidateLink(r.docId, band, bh, rep) :: out
              case _ => ()
            }
          }
          out.reverseIterator
      }
  }
}
