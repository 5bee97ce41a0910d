package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Upsert envelope: turn a keyed stream of latest-values (Kafka compacted
  * topics, Debezium after-images) into an insert/retract changelog by
  * remembering the last value per key — the reference's `ENVELOPE UPSERT`
  * (reference `src/storage-types/src/sources/envelope.rs:24-35`, operator
  * `src/storage/src/upsert.rs`).
  *
  * State is per-key in Spark's state store (RocksDB-backed when configured),
  * exactly like the reference's RocksDB-backed upsert state; partitioned by
  * key, so it scales with executor count. Works identically on batch and
  * streaming Datasets (`flatMapGroupsWithState` is supported in both).
  */
object UpsertEnvelope {

  /** `None` value = key deletion (Debezium tombstone).
    * Output rows are `(key, value, diff)` with diff ∈ {-1, +1}. */
  def toChangelog[K, V](input: Dataset[(K, Option[V])])(
      implicit kve: Encoder[(K, Option[V])],
      ke: Encoder[K],
      ve: Encoder[V],
      oute: Encoder[(K, V, Long)]): Dataset[(K, V, Long)] = {
    input
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Option[V])], state: GroupState[V]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, V, Long)]
          rows.foreach { case (_, vOpt) =>
            state.getOption.foreach(old => out += ((key, old, -1L)))
            vOpt match {
              case Some(v) => state.update(v); out += ((key, v, 1L))
              case None    => state.remove()
            }
          }
          out.iterator
      }
  }
}
