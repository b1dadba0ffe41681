package graft.serve

import java.security.MessageDigest
import java.time.Instant

/** Serving-layer response cache (reference `api/cache.py`, SURVEY.md
  * C1-C4). Engine-side caching is `df.persist` / `spark.catalog
  * .cacheTable`; this is the request-level memoization that sat in front
  * of the reference's API (Redis there, in-process LRU here — swap the
  * store behind the same interface in production).
  */
object Cache {

  /** C2 — deterministic cache key: sha-256 over sorted key=value args,
    * first 16 hex chars (reference `api/cache.py:192-203`).
    */
  def cacheKey(prefix: String, args: Map[String, String]): String = {
    // URL-encode keys and values so delimiter characters inside an arg
    // cannot collide with a different arg map ("a" -> "b&c=d" vs
    // {"a"->"b", "c"->"d"})
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val canonical = args.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8"))
    prefix + ":" + digest.take(8).map("%02x".format(_)).mkString
  }

  final case class Stats(hits: Long, misses: Long, entries: Int) {
    def hitRate: Double = if (hits + misses == 0) 0.0 else hits.toDouble / (hits + misses)
  }

  /** C1/C4 — TTL'd LRU cache with graceful stats, the `InMemoryCache`
    * fallback of the reference (`api/cache.py:282-317`) with the
    * `CacheManager` interface (get/set/delete/clearPattern/stats).
    */
  final class LruCache[V](maxEntries: Int = 1024, ttlSeconds: Long = 3600,
                          clock: () => Long = () => Instant.now.getEpochSecond) {
    private case class Entry(value: V, expiresAt: Long)
    private val map = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
        size() > maxEntries
    }
    private var hits = 0L
    private var misses = 0L

    def get(key: String): Option[V] = synchronized {
      val e = map.get(key)
      if (e == null) { misses += 1; None }
      else if (e.expiresAt < clock()) { map.remove(key); misses += 1; None }
      else { hits += 1; Some(e.value) }
    }

    def put(key: String, value: V, ttl: Long = ttlSeconds): Unit = synchronized {
      map.put(key, Entry(value, clock() + ttl))
    }

    def delete(key: String): Boolean = synchronized { map.remove(key) != null }

    /** C1 — clear keys by prefix (the Redis `clear_pattern` analog). */
    def clearPrefix(prefix: String): Int = synchronized {
      val it = map.keySet().iterator()
      var n = 0
      while (it.hasNext) if (it.next().startsWith(prefix)) { it.remove(); n += 1 }
      n
    }

    def stats: Stats = synchronized { Stats(hits, misses, map.size()) }

    /** C3 — memoize a computation under a key (the `cached` decorator). */
    def getOrCompute(key: String, ttl: Long = ttlSeconds)(compute: => V): V =
      get(key).getOrElse {
        val v = compute
        put(key, v, ttl)
        v
      }
  }
}
