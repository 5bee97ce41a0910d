package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Upsert envelope: turn a keyed stream of latest-values (Kafka compacted
  * topics, Debezium after-images) into an insert/retract changelog by
  * remembering the last value per key — the reference's `ENVELOPE UPSERT`
  * (reference `src/storage-types/src/sources/envelope.rs:24-35`, operator
  * `src/storage/src/upsert.rs`).
  *
  * "Last" is defined by an explicit **source offset** carried in each input
  * tuple — the reference orders upsert state by Kafka offset for exactly this
  * reason: Spark gives no ordering contract for the rows of one key within a
  * group iterator (shuffle order in batch; multi-row micro-batches in
  * streaming), so relying on iterator order would keep an arbitrary value.
  * The group sorts by offset before folding state.
  *
  * State is per-key in Spark's state store (RocksDB-backed when configured),
  * exactly like the reference's RocksDB-backed upsert state; partitioned by
  * key, so it scales with executor count. Works identically on batch and
  * streaming Datasets (`flatMapGroupsWithState` is supported in both).
  */
object UpsertEnvelope {

  /** `None` value = key deletion (Debezium tombstone). Input rows are
    * `(key, value, offset)`; per key, rows apply in ascending offset order.
    * Output rows are `(key, value, diff)` with diff ∈ {-1, +1}.
    *
    * State per key is `(current value, highest applied offset)` — a row at
    * or below the watermark is STALE and is skipped, so a replayed or
    * out-of-order delivery (a later micro-batch carrying an earlier offset)
    * can never clobber newer state, mirroring the reference's
    * offset-ordered upsert state. Tombstones keep the watermark (state
    * becomes `(None, offset)`), so a stale insert cannot resurrect a
    * deleted key. */
  def toChangelog[K, V](input: Dataset[(K, Option[V], Long)])(
      implicit kve: Encoder[(K, Option[V], Long)],
      ke: Encoder[K],
      ve: Encoder[V],
      ste: Encoder[(Option[V], Long)],
      oute: Encoder[(K, V, Long)]): Dataset[(K, V, Long)] = {
    input
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Option[V], Long)],
            state: GroupState[(Option[V], Long)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, V, Long)]
          var (cur, watermark) = state.getOption.getOrElse((Option.empty[V], Long.MinValue))
          rows.toSeq.sortBy(_._3).foreach { case (_, vOpt, off) =>
            if (off > watermark) {
              watermark = off
              vOpt match {
                case Some(v) =>
                  // skip no-op updates (same consolidation the reference's
                  // upsert operator applies before emitting)
                  if (!cur.contains(v)) {
                    cur.foreach(o => out += ((key, o, -1L)))
                    cur = Some(v)
                    out += ((key, v, 1L))
                  }
                case None =>
                  cur.foreach(o => out += ((key, o, -1L)))
                  cur = None
              }
            } // else: stale offset (replay / out-of-order) — ignore
          }
          state.update((cur, watermark))
          out.iterator
      }
  }
}
