package graft.core

/** The gap-sessionization state machine, shared verbatim by the batch
  * native operator (`SessionizeExec`, shim/SessionizePlan.scala) and
  * the streaming stateful form (`Streaming.sessionize`): one
  * (state, event) → state transition, O(1) state, applied to a key's
  * events in timestamp order. Sharing the kernel makes the
  * batch/streaming cross-check structural — both forms EXECUTE the
  * same decision procedure, they don't merely agree on test inputs.
  *
  * Semantics (the lag-window formulation — `lag(ts) IS NULL OR
  * ts - lag(ts) > gap` opens a session): a key's first event opens
  * session 1; an event after a NULL timestamp always opens a new
  * session (nulls sort first and each null row stands alone); a NULL
  * current timestamp after a non-null one continues the session (SQL:
  * `null > gap` is not true).
  */
object SessionGap {

  /** O(1) per-key state: the current session ordinal, the previous
    * event's epoch-second (0 when it was null), whether it was null,
    * and whether any event has been seen.
    */
  final case class State(sessionId: Long, lastSec: Long, lastNull: Boolean,
      started: Boolean)

  /** The pre-first-event state: the next event opens session 1. */
  val empty: State = State(0L, 0L, lastNull = false, started = false)

  /** Advance over one event (in per-key timestamp order). The
    * returned state's `sessionId` is the label for THIS event; it
    * increments exactly when a new session opens.
    */
  def advance(st: State, sec: Long, secNull: Boolean, gapSec: Long): State = {
    val opens = !st.started || st.lastNull || (!secNull && sec - st.lastSec > gapSec)
    State(
      sessionId = if (opens) st.sessionId + 1 else st.sessionId,
      lastSec = if (secNull) 0L else sec,
      lastNull = secNull,
      started = true)
  }
}
