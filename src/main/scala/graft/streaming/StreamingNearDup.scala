package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.SketchAggregates
import graft.operators.TextOps

/** Online MinHash-LSH near-duplicate detection — the streaming twin of
  * [[graft.operators.MinHashNearDup]] for the ingest-time question a
  * batch pass cannot answer: "is THIS arriving document a near-dup of
  * anything already admitted?", decided per micro-batch instead of per
  * corpus rebuild.
  *
  * Two pieces, split exactly where streaming constraints bite:
  *
  *  1. [[signatures]]/[[bandKeys]] — the banded-minhash sketch as a
  *     PER-ROW expression: the codegen'd
  *     [[graft.functions.MinHashSignature]] (one fused loop hashing
  *     each shingle once and updating all k minima in place — no
  *     per-shingle allocation, whole-stage codegen), then band slices.
  *     The batch operator computes the same sketch with a
  *     TypedImperativeAggregate after an explode, which on a stream
  *     would be a stateful aggregation (watermark-deferred emission);
  *     per-row there is no aggregation at all, so the sketch stage
  *     stays stateless and append-mode-safe. Coefficients are shared
  *     with the batch aggregate
  *     ([[SketchAggregates.coefA]]/[[SketchAggregates.coefB]],
  *     same `xxhash64 & 0x7fffffff` input hash, same Long.MaxValue
  *     minima init), so per-row and batch signatures are bit-identical
  *     (proven in StreamingNearDupSpec). Band keys carry the same
  *     native FNV band mix as the batch bucket join
  *     ([[graft.functions.MinHashBands]]) — see
  *     [[bandKeysFromSignatures]] for the key-size rationale.
  *
  *  2. [[streamingCandidateEvents]] — bucket memory on Spark 4's
  *     transformWithState (RocksDB state): one ListState[Long] of seen
  *     doc ids per (band, bucket) key, capped at `maxPerBucket`. Each
  *     arriving doc emits a candidate pair against every remembered
  *     occupant of any shared bucket, across micro-batch boundaries.
  *     State is O(buckets × cap) longs — the sketch bounds it
  *     independently of text size, and the cap bounds it against
  *     degenerate buckets (boilerplate floods); past the cap a new doc
  *     still PROBES the bucket (pairs against the stored occupants) but
  *     is not stored. That recall loss is OBSERVABLE, not silent: a
  *     `saturated` event is emitted per unstored (doc, bucket), so
  *     operators can size `maxPerBucket` from real traffic instead of
  *     discovering missed pairs downstream.
  *
  * Retention: with `ttl = None` the bucket memory is lifetime — the
  * corpus-admission-gate semantic, where state grows with the count of
  * DISTINCT buckets forever. For an unbounded feed pass a TTL: entries
  * expire `ttl` after the batch that stored them (RocksDB TTL state,
  * enforced on read and compacted in the background), so state size
  * plateaus at O(buckets-touched-per-horizon × cap) and a document
  * only matches near-dups admitted within the horizon. The trade is
  * explicit: TTL bounds state; anything older than the horizon is
  * forgotten and WILL be re-admitted — pick the horizon from the dedup
  * contract (e.g. "no near-dup within 30 days"), not from memory
  * pressure alone (that's what `maxPerBucket` is for). Expiry also
  * re-opens saturated buckets: the cap check counts live entries only.
  *
  * Output pairs repeat once per shared band (exactly like the batch
  * candidate join before its `distinct()`); consumers dedupe with
  * `dropDuplicates`/`dropDuplicatesWithinWatermark` on (id_a, id_b) or
  * feed the exact-Jaccard verify, which is insensitive to repeats.
  * Like the batch operator, candidates are a probabilistic superset
  * cut: verification (exact Jaccard on the shingle sets, per pair)
  * belongs downstream, e.g. in a foreachBatch join against the
  * admitted-corpus store.
  */
object StreamingNearDup {

  final case class DocText(doc_id: Long, text: String)
  final case class BandKeyRow(bucket: String, doc_id: Long)
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** The full event stream: `kind = "pair"` is a candidate (id_a < id_b,
    * `bucket` = the colliding LSH bucket); `kind = "saturated"` reports
    * a doc (`id_a`) that PROBED but could not be STORED in a full
    * `bucket` (`id_b` = the cap at the time) — aggregate these per
    * bucket/time to size `maxPerBucket` from observed traffic. */
  final case class BucketEvent(kind: String, id_a: Long, id_b: Long, bucket: String)

  /** Per-row minhash signatures: (doc_id, sig array[numHashes]).
    * Documents with no shingles (shorter than the shingle width) are
    * dropped, matching the batch operator's `size(sh) > 0` filter. */
  def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      numHashes: Int = 64): DataFrame =
    signaturesFromShingles(
      docs.select(col(idCol).cast("long").as("doc_id"),
        TextOps.shinglesFromTokens(TextOps.tokens(col(textCol)), shingleWidth)
          .as("graft__sh")),
      numHashes)

  /** Signatures over a pre-shingled (doc_id, graft__sh) relation — lets
    * a batch caller (n68) share one materialized shingle pass between
    * the sketch and the exact verify. */
  def signaturesFromShingles(
      shingled: DataFrame,
      numHashes: Int = 64): DataFrame =
    shingled
      .filter(size(col("graft__sh")) > 0)
      // codegen'd fused fold (31-bit input hash identical to
      // MinHashBandSketch.update; see MinHashSignature for the
      // bit-parity contract with the former HOF spelling)
      .withColumn("graft__sig",
        call_function("graft_minhash_sig", col("graft__sh"), lit(numHashes)))
      .select(col("doc_id"), col("graft__sig"))

  /** One (bucket, doc_id) row per band: bucket = "band:minima-run".
    * Two documents share a bucket iff their band rows agree — the same
    * collision predicate as the batch band join. */
  def bandKeys(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame =
    bandKeysFromSignatures(
      signatures(docs, idCol, textCol, shingleWidth, numHashes),
      numHashes, bands)

  /** The band-key explode over a (doc_id, graft__sig) relation.
    *
    * Bucket = `band:fnv64(minima-run)` via the native
    * [[graft.functions.MinHashBands]] mix — the same band values the
    * batch bucket join keys on. The earlier spelling carried the raw
    * minima run as an up-to-~80-char string (four 19-digit longs)
    * because a SQL-side FNV would overflow under ANSI; the native
    * expression removed that constraint, shrinking every shuffle key
    * and RocksDB state key ~4×. Equality weakens from exact-run to
    * FNV-collision (~2⁻⁶⁴ per bucket pair): a collision only ADDS a
    * candidate, and candidates are a probabilistic superset cut
    * already — the downstream exact-Jaccard verify is unchanged.
    *
    * STATE-FORMAT BREAK (v1 → v2): this change renamed every bucket —
    * `band:minima-run` keys became `band:fnv64` — so a streaming query
    * resumed from a pre-change RocksDB checkpoint will never match its
    * old bucket entries (near-dup detection across the upgrade boundary
    * silently lost, old state lingering unreclaimed until TTL). When
    * upgrading a RUNNING stream past this boundary, start from a fresh
    * checkpoint dir and replay the dedup horizon; do not resume. */
  def bandKeysFromSignatures(
      sigs: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    sigs
      .select(col("doc_id"),
        posexplode(expr(s"graft_minhash_band_mix(graft__sig, $bands)"))
          .as(Seq("graft__band", "graft__bv")))
      .select(
        concat(col("graft__band"), lit(":"), col("graft__bv")).as("bucket"),
        col("doc_id"))
  }

  /** Bucket memory: remembers up to `maxPerBucket` LIVE doc ids per LSH
    * bucket and pairs every arrival against them; emits `saturated`
    * events for arrivals a full bucket could not store. With a TTL,
    * `seen.get()` returns only unexpired entries, so eviction is
    * transparent here — expired occupants stop matching AND stop
    * counting against the cap. */
  private class BucketProcessor(maxPerBucket: Int, ttl: TTLConfig)
    extends StatefulProcessor[String, BandKeyRow, BucketEvent] {
    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(
        bucket: String,
        rows: Iterator[BandKeyRow],
        timerValues: TimerValues): Iterator[BucketEvent] = {
      val prior = seen.get().toVector
      val priorSet = prior.toSet
      val fresh = rows.map(_.doc_id).toVector.distinct
        .filterNot(priorSet)
      val out = Vector.newBuilder[BucketEvent]
      fresh.zipWithIndex.foreach { case (n, i) =>
        (prior.iterator ++ fresh.iterator.take(i)).foreach { p =>
          out += BucketEvent("pair", math.min(p, n), math.max(p, n), bucket)
        }
      }
      val room = maxPerBucket - prior.size
      if (room > 0 && fresh.nonEmpty)
        seen.appendList(fresh.take(room).toArray)
      fresh.drop(math.max(room, 0)).foreach { n =>
        out += BucketEvent("saturated", n, maxPerBucket.toLong, bucket)
      }
      out.result().iterator
    }
  }

  /** The full event stream (pairs + saturation signals) over a document
    * feed: stateless per-row sketch → band-key explode → stateful bucket
    * memory. Requires the RocksDB state store provider
    * (transformWithState mandates it). `ttl` bounds the memory to a
    * dedup horizon (processing-time based); None = lifetime. */
  def streamingCandidateEvents(
      docs: Dataset[DocText],
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxPerBucket: Int = 64,
      ttl: Option[java.time.Duration] = None): Dataset[BucketEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bucketEvents(
      bandKeys(docs.toDF(), "doc_id", "text", shingleWidth, numHashes, bands)
        .as[BandKeyRow],
      maxPerBucket, ttl)
  }

  /** The bucket-memory stage alone, over an already-keyed feed — the
    * processor is key-agnostic, which is what lets the n173 parity
    * gate drive it with PORTABLE keys the DuckDB oracle can replay
    * (the real sketch path keys with engine-local xxhash, which no
    * oracle sees — the reason the cap path was oracle-exempt until
    * this seam existed). */
  def bucketEvents(
      keys: Dataset[BandKeyRow],
      maxPerBucket: Int,
      ttl: Option[java.time.Duration] = None): Dataset[BucketEvent] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val processor = new BucketProcessor(
      maxPerBucket, ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    keys
      .groupByKey(_.bucket)
      .transformWithState(
        processor,
        // TTL state requires a clock; otherwise stay time-mode-free
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch-fold spelling of [[bucketEvents]]' admission/cap semantics
    * (the n138/n168 fold recipe): per batch, the distinct (bucket, doc)
    * hitters not already stored are the FRESH arrivals in doc-id order;
    * every fresh doc pairs against the bucket's stored occupants AND
    * every earlier fresh arrival in the same batch (same-batch pairs
    * ignore the cap — the processor emits before it trims), then at
    * most (cap − stored) fresh docs are admitted per bucket and the
    * rest emit `saturated` events (id_b = the cap, mirroring
    * BucketEvent). State threads between batches as the stored
    * (bucket, doc_id) relation. For doc-id-ordered batch cuts the
    * stored set after any prefix of batches is exactly the first
    * min(cap, hitters) docs per bucket in doc-id order — the
    * declarative rule the n173 oracle states with one window.
    * StreamingNearDupSpec proves the REAL processor emits the
    * identical event multiset on the same cuts. */
  def capAdmissionFold(
      batches: Seq[DataFrame], cap: Int): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sc = batches.head.sparkSession.sparkContext
    var stored: DataFrame = null
    var events: DataFrame = null
    var held: scala.collection.Set[Int] = Set.empty
    batches.zipWithIndex.foreach { case (b0, bi) =>
      val isLast = bi == batches.length - 1
      val hit = b0.select(col("bucket"), col("doc_id")).distinct()
      val fresh =
        if (stored == null) hit
        else hit.join(stored, Seq("bucket", "doc_id"), "left_anti")
      val cross =
        if (stored == null) null
        else fresh.select(col("bucket"), col("doc_id").as("graft__n"))
          .join(stored.select(col("bucket"), col("doc_id").as("graft__p")),
            Seq("bucket"))
          .select(lit("pair").as("kind"),
            least(col("graft__p"), col("graft__n")).as("id_a"),
            greatest(col("graft__p"), col("graft__n")).as("id_b"),
            col("bucket"))
      val same = fresh.select(col("bucket"), col("doc_id").as("graft__a"))
        .join(fresh.select(col("bucket"), col("doc_id").as("graft__b")),
          Seq("bucket"))
        .filter(col("graft__a") < col("graft__b"))
        .select(lit("pair").as("kind"), col("graft__a").as("id_a"),
          col("graft__b").as("id_b"), col("bucket"))
      val storedCnt =
        if (stored == null) null
        else stored.groupBy(col("bucket")).agg(count(lit(1)).as("graft__cnt"))
      val ranked0 = fresh.withColumn("graft__rk",
        row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
      val ranked =
        (if (storedCnt == null) ranked0.withColumn("graft__cnt", lit(0L))
         else ranked0.join(broadcast(storedCnt), Seq("bucket"), "left")
           .withColumn("graft__cnt", coalesce(col("graft__cnt"), lit(0L))))
          .withColumn("graft__room", lit(cap.toLong) - col("graft__cnt"))
      val admitted = ranked.filter(col("graft__rk") <= col("graft__room"))
        .select(col("bucket"), col("doc_id"))
      val sat = ranked.filter(col("graft__rk") > col("graft__room"))
        .select(lit("saturated").as("kind"), col("doc_id").as("id_a"),
          lit(cap.toLong).as("id_b"), col("bucket"))
      val batchEvents = Seq(Option(cross), Some(same), Some(sat))
        .flatten.reduce(_ unionByName _)
      val nextEvents = if (events == null) batchEvents
        else events.unionByName(batchEvents)
      if (isLast) {
        // the final round's events stay lazy (consumed once by the
        // caller) and the post-batch stored set is never read
        events = nextEvents
      } else {
        // checkpoint both carried relations, then release the previous
        // round's blocks (the labelPropagationTrain discipline):
        // everything the released blocks fed — this round's events and
        // stored — is materialized first, so nothing live recomputes;
        // a per-round persist without release would accumulate one
        // cached generation per micro-batch for the session's life
        val (eCk, eIds, _) = graft.operators.IterationCheckpoint
          .localCounted(nextEvents)
        val (sCk, sIds, _) = graft.operators.IterationCheckpoint
          .localCounted(
            if (stored == null) admitted else stored.unionByName(admitted))
        graft.operators.IterationCheckpoint.release(sc, held)
        held = eIds ++ sIds
        events = eCk
        stored = sCk
      }
    }
    events
  }

  /** Candidate pairs only — the original surface, now a filter over
    * [[streamingCandidateEvents]]. */
  def streamingCandidatePairs(
      docs: Dataset[DocText],
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxPerBucket: Int = 64,
      ttl: Option[java.time.Duration] = None): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    streamingCandidateEvents(docs, shingleWidth, numHashes, bands, maxPerBucket, ttl)
      .filter(_.kind == "pair")
      .map(e => CandidatePair(e.id_a, e.id_b))
  }
}
