package graft.serve

import org.scalatest.funsuite.AnyFunSuite

class CacheSpec extends AnyFunSuite {
  import Cache._

  test("cacheKey is order-insensitive and stable") {
    val a = cacheKey("climate", Map("lat" -> "10", "lon" -> "20"))
    val b = cacheKey("climate", Map("lon" -> "20", "lat" -> "10"))
    assert(a == b)
    assert(a.startsWith("climate:") && a.length == "climate:".length + 16)
    assert(a != cacheKey("climate", Map("lat" -> "10", "lon" -> "21")))
  }

  test("LRU cache: hit/miss stats, TTL expiry, eviction, prefix clear") {
    var now = 1000L
    val c = new LruCache[String](maxEntries = 2, ttlSeconds = 10, clock = () => now)
    c.put("a:1", "x"); c.put("a:2", "y")
    assert(c.get("a:1").contains("x"))
    c.put("b:3", "z") // evicts LRU (a:2 — a:1 was just touched)
    assert(c.get("a:2").isEmpty)
    assert(c.get("a:1").contains("x"))
    now += 11 // TTL passes
    assert(c.get("a:1").isEmpty)
    c.put("a:4", "w"); c.put("a:5", "v") // second put evicts untouched b:3
    assert(c.clearPrefix("a:") == 2)
    val s = c.stats
    assert(s.hits == 2 && s.misses == 2 && s.entries == 0)
  }

  test("getOrCompute memoizes") {
    val c = new LruCache[Int]()
    var calls = 0
    def compute = { calls += 1; 42 }
    assert(c.getOrCompute("k")(compute) == 42)
    assert(c.getOrCompute("k")(compute) == 42)
    assert(calls == 1)
  }
}
