package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous-ingest dedup: the streaming twin of
  * [[graft.ops.DedupOps.incrementalDedup]]'s exact pass — an unbounded
  * document feed deduplicated against (a) the EXISTING corpus and
  * (b) itself, with watermark-bounded state.
  *
  * Composition is deliberately all built-ins — the Spark-first shape:
  *
  *   1. `xxhash64(key)` — the 8-byte dedup key, row-local (the corpus
  *      side is only ever read as hashes, the incrementalDedup index
  *      contract);
  *   2. **stream-static left-anti join** against the existing corpus's
  *      key frame — Spark plans the static side as a broadcast/shuffled
  *      hash join per micro-batch, so "already in the corpus" costs no
  *      state at all;
  *   3. **`dropDuplicatesWithinWatermark`** on the key — first arrival
  *      wins within the stream, and state for a key is DROPPED once the
  *      watermark passes its event time + delay: an endless feed holds
  *      only the active window's keys, never the corpus (the unbounded
  *      `dropDuplicates` state growth every naive streaming dedup hits).
  *
  * Semantics vs the batch op, by design:
  *   - within-stream duplicates are DROPPED here (first arrival wins);
  *     batch `incrementalDedup` keeps intra-batch duplicates and
  *     documents why — a batch caller composes `exactDedup` separately,
  *     a stream has no "batch" to compose over, so the stateful dedup IS
  *     the composition. IngestDedupStreamSpec pins streamed == batch
  *     (anti join + first-per-key) on the same feed.
  *   - a duplicate arriving AFTER the watermark has expired its key's
  *     state is re-admitted — the documented watermark trade: bounded
  *     state in exchange for no-dedup-beyond-the-lateness-horizon.
  *     Size `watermarkDelay` to the feed's real re-post horizon: it is
  *     the single knob — `dropDuplicatesWithinWatermark` expires state
  *     at exactly the `withWatermark` delay, there is no separate TTL.
  *
  * At 100 TB: the static key frame is the only corpus-sized input and it
  * carries 8 bytes per document; per-micro-batch work is one hash join
  * plus one keyed state lookup — the same two shuffles the batch op pays,
  * amortized continuously.
  */
object IngestDedupStream {

  /** Deduplicated pass-through of `incoming` (a STREAMING frame):
    * drops rows whose key hash appears in `existingKeys` (static frame,
    * read as hashes of its FIRST column) or has already arrived within
    * the watermark horizon. `eventTimeCol` must be a timestamp column of
    * `incoming`; `watermarkDelay` is a Spark duration string (e.g.
    * "10 minutes") and governs BOTH late-data admission and the dedup
    * state's expiry (`dropDuplicatesWithinWatermark` takes no delay of
    * its own).
    */
  def dedupedIngest(
      incoming: DataFrame,
      existingKeys: DataFrame,
      keyCol: Column,
      eventTimeCol: String,
      watermarkDelay: String): DataFrame = {
    val exKeys = existingKeys
      .select(xxhash64(col(existingKeys.columns.head)).as("__k"))
      .distinct()
    incoming
      .withColumn("__k", xxhash64(keyCol))
      .join(exKeys, Seq("__k"), "left_anti")
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__k")
      .drop("__k")
  }

  /** Batch reference of the same semantics for the streamed == batch
    * differential: anti join on the existing keys, then first arrival
    * per key (ties by the id column for determinism).
    */
  def batchReference(
      incoming: DataFrame,
      existingKeys: DataFrame,
      keyCol: Column,
      eventTimeCol: String,
      idCol: String): DataFrame = {
    val exKeys = existingKeys
      .select(xxhash64(col(existingKeys.columns.head)).as("__k"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy(col(eventTimeCol).asc, col(idCol).asc)
    incoming
      .withColumn("__k", xxhash64(keyCol))
      .join(exKeys, Seq("__k"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__k", "__rn")
  }
}
