package graft.streaming

/** Shared reorder-buffer step for the `(ms, event_id, event_type)` stream
  * folds: merge the carried buffer with this batch's arrivals, sort by
  * `(ms, event_id)`, and fail loudly on duplicate keys (re-delivery is
  * not reordering). Used by the bespoke buffered AND watermark-native
  * modes of [[FunnelStreams]] / [[TransitionStreams]] so the dup-scan
  * and sort ordering can never diverge between the four folds. */
private[streaming] object ReorderBuffer {

  def mergeSorted(
      bufMs: Seq[Long], bufIds: Seq[Long], bufTypes: Seq[String],
      arrivals: Seq[(Long, Long, String)],
      who: String, key: Any): Seq[(Long, Long, String)] = {
    val buf = (bufMs.lazyZip(bufIds).lazyZip(bufTypes).toSeq ++ arrivals)
      .sortBy(t => (t._1, t._2))
    var d = 1
    while (d < buf.length) {
      if (buf(d)._1 == buf(d - 1)._1 && buf(d)._2 == buf(d - 1)._2)
        throw new IllegalStateException(
          s"$who: duplicate (ms, event_id) (${buf(d)._1}, ${buf(d)._2}) " +
            s"for user $key — re-delivery is not reordering")
      d += 1
    }
    buf
  }
}
