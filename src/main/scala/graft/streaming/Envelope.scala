package graft.streaming

/** The engine's event envelope (SURVEY §1.2).
  *
  * Mirrors the reference's `EventBox` (/root/reference/src/event.rs:62-67)
  * as *data* instead of runtime machinery:
  *   - `event_id`    — publication order, assigned by the hub at post
  *     time; replaces the reference's implicit lock-serialized order
  *     (/root/reference/src/event_streams.rs:39,56) with an explicit,
  *     shuffle-survivable sort key — required at 100 TB where no global
  *     lock can exist.
  *   - `event_type`  — the runtime type tag (`TypeId`,
  *     /root/reference/src/event.rs:63); here a discriminator string.
  *   - `payload`     — the typed event (`Box<dyn Any>` becomes a typed
  *     column; open payloads go through a JSON string column instead).
  *   - `source_id`   — causal lineage (/root/reference/src/event.rs:66):
  *     the *root* ancestor's event_id, so sorting any derived stream by
  *     `source_id` restores end-to-end causal order (R12) without the
  *     reference's Arc-refcount pinning.
  */
final case class Envelope[T](
    event_id: Long,
    event_type: String,
    payload: T,
    source_id: Option[Long]) {

  /** Root lineage id: this event's own id if underived. */
  def rootId: Long = source_id.getOrElse(event_id)
}
