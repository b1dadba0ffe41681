package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz of the serving LRU cache: a naive reference model
  * (map + recency list) replays every semantic the implementation
  * promises — access-order recency (get hits AND puts refresh), eviction
  * of the least-recent entry when size exceeds capacity (an EXPIRED but
  * untouched entry still occupies a slot), strict-< TTL expiry on read
  * (expiresAt == now is still valid), expired reads counting as misses,
  * delete/clearPrefix leaving stats untouched — against 600 random
  * operations with a controllable clock. Every get's outcome and the
  * running stats triple must match the model exactly.
  */
class CacheFuzzSpec extends AnyFunSuite {

  private final class Model(maxEntries: Int) {
    // insertion/access-ordered: last = most recent
    private var order = Vector.empty[String]
    private val values = scala.collection.mutable.Map.empty[String, (String, Long)]
    var hits = 0L
    var misses = 0L

    private def touch(k: String): Unit = order = order.filterNot(_ == k) :+ k

    def get(k: String, now: Long): Option[String] =
      values.get(k) match {
        case None => misses += 1; None
        case Some((_, exp)) if exp < now =>
          values.remove(k); order = order.filterNot(_ == k); misses += 1; None
        case Some((v, _)) => hits += 1; touch(k); Some(v)
      }

    def put(k: String, v: String, now: Long, ttl: Long): Unit = {
      values(k) = (v, now + ttl)
      touch(k)
      if (values.size > maxEntries) {
        val evict = order.head
        order = order.tail
        values.remove(evict)
      }
    }

    def delete(k: String): Boolean = {
      val had = values.remove(k).isDefined
      order = order.filterNot(_ == k)
      had
    }

    def clearPrefix(p: String): Int = {
      val ks = values.keys.filter(_.startsWith(p)).toSeq
      ks.foreach(delete)
      ks.size
    }

    def entries: Int = values.size
  }

  test("LruCache matches the reference model over random op sequences") {
    val rnd = new scala.util.Random(20260816L)
    var now = 1000L
    val cache = new Cache.LruCache[String](maxEntries = 4, ttlSeconds = 10,
      clock = () => now)
    val model = new Model(maxEntries = 4)
    val keys = (0 until 8).map(i => s"${if (i < 4) "a" else "b"}:k$i")
    (0 until 600).foreach { op =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // get
          val k = keys(rnd.nextInt(keys.length))
          val got = cache.get(k)
          val want = model.get(k, now)
          assert(got == want, s"op $op: get($k) at t=$now: $got != $want")
        case 4 | 5 | 6 => // put (occasionally with a custom ttl)
          val k = keys(rnd.nextInt(keys.length))
          val v = s"v$op"
          if (rnd.nextBoolean()) { cache.put(k, v); model.put(k, v, now, 10) }
          else { cache.put(k, v, ttl = 3); model.put(k, v, now, 3) }
        case 7 => // delete
          val k = keys(rnd.nextInt(keys.length))
          assert(cache.delete(k) == model.delete(k), s"op $op: delete($k)")
        case 8 => // clearPrefix
          val p = if (rnd.nextBoolean()) "a:" else "b:"
          assert(cache.clearPrefix(p) == model.clearPrefix(p),
            s"op $op: clearPrefix($p)")
        case 9 => // advance the clock (sometimes exactly TO an expiry edge)
          now += rnd.nextInt(7).toLong
      }
      val st = cache.stats
      assert(st.hits == model.hits && st.misses == model.misses &&
        st.entries == model.entries,
        s"op $op at t=$now: stats (${st.hits},${st.misses},${st.entries}) != " +
          s"model (${model.hits},${model.misses},${model.entries})")
    }
  }
}
