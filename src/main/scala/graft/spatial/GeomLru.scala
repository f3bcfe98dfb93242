package graft.spatial

/** Bounded per-task LRU of geometries deserialized from WKB, keyed by
  * (cell, id) — the shared refine-kernel cache for the fact×fact spatial
  * joins ([[DistributedPip]]'s PIP refine, [[SpatialOps]]'s crossing
  * refine). Each task sees few distinct (cell, id) pairs because the join
  * co-locates by cell; the cap bounds executor memory when an AQE skew
  * split still co-locates many entries (entries are cheap to rebuild on a
  * miss). The map is a @transient lazy access-ordered LinkedHashMap,
  * rebuilt per task deserialization — tasks are single-threaded, so no
  * synchronization. `load` must be serializable (a closure over object
  * methods). */
private[spatial] final class GeomLru[V](cap: Int, load: Array[Byte] => V)
    extends Serializable {
  @transient private lazy val m =
    new java.util.LinkedHashMap[(Long, Long), V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[(Long, Long), V]): Boolean =
        size() > cap
    }
  def get(key: (Long, Long), wkb: Array[Byte]): V = {
    var v = m.get(key)
    if (v == null) { v = load(wkb); m.put(key, v) }
    v
  }
}
