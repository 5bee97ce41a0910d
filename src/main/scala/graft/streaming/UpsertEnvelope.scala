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
    * Output rows are `(key, value, diff)` with diff ∈ {-1, +1}. */
  def toChangelog[K, V](input: Dataset[(K, Option[V], Long)])(
      implicit kve: Encoder[(K, Option[V], Long)],
      ke: Encoder[K],
      ve: Encoder[V],
      oute: Encoder[(K, V, Long)]): Dataset[(K, V, Long)] = {
    input
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Option[V], Long)], state: GroupState[V]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, V, Long)]
          rows.toSeq.sortBy(_._3).foreach { case (_, vOpt, _) =>
            val old = state.getOption
            vOpt match {
              case Some(v) =>
                // skip no-op updates (same consolidation the reference's
                // upsert operator applies before emitting)
                if (!old.contains(v)) {
                  old.foreach(o => out += ((key, o, -1L)))
                  state.update(v)
                  out += ((key, v, 1L))
                }
              case None =>
                old.foreach(o => out += ((key, o, -1L)))
                state.remove()
            }
          }
          out.iterator
      }
  }
}
