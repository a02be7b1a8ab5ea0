package graft.core

/** Session-lifetime memo for small PLAIN DRIVER VALUES derived
  * deterministically from a content-fingerprinted input (trained
  * centroid matrices, parameter grids): the SuffixOps rank-level sharing
  * pattern, minus its eviction hazard — values here hold no Spark
  * resources (no cached/checkpointed frames), so FIFO eviction can never
  * invalidate an in-flight plan; a re-build after eviction recomputes
  * the identical value.
  *
  * Callers key by a string embedding the session identity, the input's
  * content fingerprint ([[Fingerprint]] form — order-independent
  * xxhash64 xor ∥ sum + count), and every parameter that shapes the
  * value.
  */
object DriverMemo {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, Any]
  private val keys =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxEntries = 256
  private val hitN = new java.util.concurrent.atomic.AtomicLong
  private val missN = new java.util.concurrent.atomic.AtomicLong

  /** (hits, misses) since JVM start — Bench's warm-rep tagging. */
  def stats: (Long, Long) = (hitN.get, missN.get)

  def cached[T](key: String)(build: => T): T =
    memo.get(key) match {
      case Some(v) => hitN.incrementAndGet(); v.asInstanceOf[T]
      case None =>
        missN.incrementAndGet()
        val v = build
        if (memo.putIfAbsent(key, v).isEmpty) {
          keys.add(key)
          while (keys.size > MaxEntries) {
            val evict = keys.poll()
            if (evict != null) memo.remove(evict)
          }
        }
        v
    }
}
