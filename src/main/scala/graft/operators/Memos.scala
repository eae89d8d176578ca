package graft.operators

/** Registry of the engine's cross-query model memos (cluster labels,
  * IVF index, PQ codebooks, table counts). Each memo registers its
  * clear function here, giving callers one invalidation path:
  *  - `Bench` in cold mode (`SPARK_GRAFT_BENCH_COLD=1`) clears between
  *    reps so every timed run pays full training cost;
  *  - long-lived JVMs that cycle SparkSessions can clear to release the
  *    localCheckpoint'd frames (the memo keys hold session references,
  *    so without clearing, stopped sessions pin executor blocks). */
object Memos {
  private val clearers = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  def register(clear: () => Unit): Unit = synchronized { clearers += clear }
  def clearAll(): Unit = synchronized { clearers.foreach(_.apply()) }
}
