package graft.streaming

/** Shared event-time conversion for the stateful streaming operators
  * (one definition so µs semantics can't drift between them).
  */
private[streaming] object StreamTime {
  def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
}
