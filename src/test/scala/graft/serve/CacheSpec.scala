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

  test("FileBackend: cross-instance visibility, TTL, prefix clear, atomic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cache")
    var now = 1000L
    val a = new FileBackend(dir, clock = () => now)
    val b = new FileBackend(dir, clock = () => now) // a second "process"
    a.put("stats:0001", "v1", ttlSeconds = 10)
    assert(b.get("stats:0001").contains("v1"), "second instance sees the entry")
    b.put("stats:0001", "v2", ttlSeconds = 10)
    assert(a.get("stats:0001").contains("v2"))
    a.put("point:0002", "p", ttlSeconds = 10)
    assert(a.entryCount == 2)
    now += 11
    assert(a.get("stats:0001").isEmpty, "expired entry reads as miss")
    a.put("stats:0003", "x", ttlSeconds = 100)
    a.put("stats:0004", "y", ttlSeconds = 100)
    assert(a.clearPrefix("stats:") == 2)
    assert(b.get("stats:0003").isEmpty)
    // keys with filesystem-hostile characters round-trip
    a.put("we/ird:k?y=1", "z", ttlSeconds = 100)
    assert(b.get("we/ird:k?y=1").contains("z"))
  }

  test("FileBackend: corrupt/foreign entries read as a miss and are " +
    "removed, never as a backend error (no NumberFormatException)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cache-corrupt")
    val a = new FileBackend(dir, clock = () => 1000L)
    def plant(key: String, bytes: String): java.nio.file.Path =
      java.nio.file.Files.write(
        dir.resolve(java.net.URLEncoder.encode(key, "UTF-8") + ".cache"),
        bytes.getBytes("UTF-8"))
    plant("no-newline", "garbage-without-a-newline")
    plant("empty", "")
    plant("bad-expiry", "not-a-number\npayload")
    plant("empty-first-line", "\npayload")
    Seq("no-newline", "empty", "bad-expiry", "empty-first-line").foreach { k =>
      assert(a.get(k).isEmpty, s"corrupt entry '$k' must read as a miss")
    }
    assert(a.entryCount == 0, "corrupt entries are removed on read")
    // a corrupt file must not count toward ResilientCache's three-strike
    // degraded bypass — the healthy path keeps caching afterwards
    val rc = new ResilientCache(a)
    plant("later", "also-bad")
    assert(rc.getOrCompute("later")("fresh") == "fresh")
    assert(rc.stats.errors == 0 && !rc.stats.degraded)
    // an entry with an empty PAYLOAD (valid expiry, trailing newline) is
    // still a hit — only the expiry line is validated
    a.put("empty-value", "", ttlSeconds = 100)
    assert(a.get("empty-value").contains(""))
  }

  test("ResilientCache: hits/misses over a healthy backend") {
    val c = new ResilientCache(new LruBackend(ttlSeconds = 100))
    var calls = 0
    def compute = { calls += 1; "r" }
    assert(c.getOrCompute("k")(compute) == "r")
    assert(c.getOrCompute("k")(compute) == "r")
    assert(calls == 1)
    val s = c.stats
    assert(s.hits == 1 && s.misses == 1 && s.errors == 0 && !s.degraded)
  }

  test("ResilientCache: backend failure degrades to compute, never throws") {
    var broken = true
    val flaky = new CacheBackend {
      val inner = new LruBackend(ttlSeconds = 100)
      private def gate[A](a: => A): A =
        if (broken) throw new RuntimeException("backend down") else a
      def get(key: String) = gate(inner.get(key))
      def put(key: String, value: String, ttlSeconds: Long) =
        gate(inner.put(key, value, ttlSeconds))
      def delete(key: String) = gate(inner.delete(key))
      def clearPrefix(prefix: String) = gate(inner.clearPrefix(prefix))
      def entryCount = inner.entryCount
      def describe = "flaky"
    }
    val c = new ResilientCache(flaky, maxErrors = 3)
    var calls = 0
    def compute = { calls += 1; s"r$calls" }
    // requests always succeed while the backend throws
    (1 to 5).foreach(_ => assert(c.getOrCompute("k")(compute).startsWith("r")))
    assert(calls == 5, "every call recomputes while the backend is down")
    assert(c.stats.degraded, "after maxErrors consecutive failures, degraded")
    // recovery: a periodic probe finds the backend healthy again and
    // caching resumes — the tail of the run serves one cached value
    broken = false
    val results = (1 to 40).map(_ => c.getOrCompute("k")(compute))
    assert(results.drop(20).distinct.size == 1, "backend resumed serving cached values")
    assert(!c.stats.degraded)
    val callsAfter = calls
    (1 to 5).foreach(_ => c.getOrCompute("k")(compute))
    assert(calls == callsAfter, "post-recovery hits do not recompute")
  }

  test("network backend: full protocol roundtrip against a live cache node") {
    val server = new CacheServer(new LruBackend(ttlSeconds = 100)).start()
    try {
      val net = new NetBackend("127.0.0.1", server.boundPort)
      assert(net.ping())
      assert(net.get("k1").isEmpty)
      net.put("k1", "value one", 100)
      net.put("k2", "value\ntwo with spaces and \u00fcnicode", 100)
      net.put("other:x", "y", 100)
      assert(net.get("k1").contains("value one"))
      assert(net.get("k2").contains("value\ntwo with spaces and \u00fcnicode"))
      assert(net.entryCount == 3)
      assert(net.delete("k1"))
      assert(!net.delete("k1"))
      assert(net.get("k1").isEmpty)
      // keys with spaces/newlines survive URL encoding on the wire
      net.put("key with space\nand newline", "v", 100)
      assert(net.get("key with space\nand newline").contains("v"))
      assert(net.clearPrefix("other:") == 1)
      assert(net.get("other:x").isEmpty)
      net.close()
    } finally server.stop()
  }

  test("network backend: oversized PUT is drained, not parsed as commands") {
    // an over-cap PUT's value body is already in flight when the node
    // rejects it; the node must consume those bytes before replying ERR,
    // or value lines like "DEL k" would execute against the backend
    val backing = new LruBackend(ttlSeconds = 100)
    val server = new CacheServer(backing, maxValueBytes = 64).start()
    try {
      backing.put("victim", "data", 100)
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val out = sock.getOutputStream
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        val body = ("DEL victim\n" + "CLEAR \n" + ("x" * 80)).take(100)
        out.write(s"PUT big 100 ${body.length}\n".getBytes("UTF-8"))
        out.write(body.getBytes("UTF-8")); out.flush()
        val r1 = in.readLine()
        assert(r1 != null && r1.startsWith("ERR"), s"expected ERR, got $r1")
        // the stream is still in sync: the next real command works and the
        // embedded DEL line did NOT execute
        out.write("GET victim\n".getBytes("UTF-8")); out.flush()
        val r2 = in.readLine()
        assert(r2 == "HIT 4", s"victim survived and protocol resynced, got $r2")
      } finally sock.close()
    } finally server.stop()
  }

  test("network backend: a newline-free byte flood drops the connection " +
    "at the line cap instead of buffering until OOM") {
    val backing = new LruBackend(ttlSeconds = 100)
    backing.put("k", "v", 100)
    val server = new CacheServer(backing).start()
    try {
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val out = sock.getOutputStream
        // stream >64 KiB with no newline: the node must cut the
        // connection (bounded buffer), not accumulate forever
        val chunk = ("y" * 8192).getBytes("UTF-8")
        var dropped = false
        try {
          (0 until 64).foreach { _ => out.write(chunk); out.flush() }
          // if the writes all succeeded, the read must see EOF
          dropped = sock.getInputStream.read() == -1
        } catch { case _: java.io.IOException => dropped = true }
        assert(dropped, "node must drop a capless-line connection")
      } finally sock.close()
      // the node itself survives and serves other clients
      val net = new NetBackend("127.0.0.1", server.boundPort)
      assert(net.get("k").contains("v"))
    } finally server.stop()
  }

  test("network backend: TTL expiry is enforced by the cache node") {
    var now = 1000L
    val server = new CacheServer(new LruBackend(ttlSeconds = 100, clock = () => now)).start()
    try {
      val net = new NetBackend("127.0.0.1", server.boundPort)
      net.put("k", "v", 50)
      assert(net.get("k").contains("v"))
      now += 51
      assert(net.get("k").isEmpty, "expired on the node")
      net.close()
    } finally server.stop()
  }

  test("network backend behind ResilientCache: node death degrades to compute, restart recovers") {
    val backing = new LruBackend(ttlSeconds = 100)
    val server1 = new CacheServer(backing).start()
    val port = server1.boundPort
    val net = new NetBackend("127.0.0.1", port)
    val c = new ResilientCache(net, maxErrors = 3)
    var calls = 0
    def compute = { calls += 1; s"r$calls" }
    assert(c.getOrCompute("k")(compute) == "r1")
    assert(c.getOrCompute("k")(compute) == "r1", "second lookup is a network hit")
    assert(calls == 1)
    server1.stop()
    // node down: every request still succeeds, by recomputing
    (1 to 5).foreach(_ => assert(c.getOrCompute("k")(compute).startsWith("r")))
    assert(c.stats.degraded)
    // node restarts on the SAME port (state lost — a fresh LRU, like a
    // restarted Redis without persistence): probe reconnects and caching
    // resumes
    val server2 = new CacheServer(new LruBackend(ttlSeconds = 100), port = port).start()
    try {
      val results = (1 to 40).map(_ => c.getOrCompute("k")(compute))
      assert(results.drop(20).distinct.size == 1, "reconnected and serving cached values")
      assert(!c.stats.degraded)
      net.close()
    } finally server2.stop()
  }

  test("single-flight: concurrent misses on one key compute ONCE; a failed " +
    "compute propagates to its waiters and a later request retries fresh") {
    val cache = new ResilientCache(new LruBackend(maxEntries = 16,
      ttlSeconds = 60), ttlSeconds = 60)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val inCompute = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val results = java.util.Collections
      .synchronizedList(new java.util.ArrayList[String]())
    def worker() = new Thread(() => {
      val v = cache.getOrCompute("k") {
        computes.incrementAndGet()
        inCompute.countDown()
        release.await()
        "value"
      }
      results.add(v); ()
    })
    val winner = worker()
    winner.start()
    inCompute.await() // the flight is open; everyone below must join it
    val waiters = (0 until 8).map(_ => worker())
    waiters.foreach(_.start())
    Thread.sleep(100) // waiters reach join()
    release.countDown()
    winner.join(); waiters.foreach(_.join())
    assert(computes.get() == 1, "the herd must share one compute")
    assert(results.size == 9 && {
      import scala.jdk.CollectionConverters._
      results.asScala.forall(_ == "value")
    })
    val s = cache.stats
    assert(s.misses == 1 && s.hits == 8, s"stats: $s")
    // failure propagation: waiters see the winner's error once, the NEXT
    // request retries (the slot is cleared)
    val boom = new java.util.concurrent.CountDownLatch(1)
    val go = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val failer = new Thread(() => {
      try cache.getOrCompute("f") {
        boom.countDown(); go.await()
        throw new RuntimeException("compute failed")
      } catch { case _: RuntimeException => errs.incrementAndGet(); () }
    })
    failer.start(); boom.await()
    val failWaiter = new Thread(() => {
      try { cache.getOrCompute("f")(fail("waiter must not compute")); () }
      catch { case _: RuntimeException => errs.incrementAndGet(); () }
    })
    failWaiter.start()
    Thread.sleep(100)
    go.countDown()
    failer.join(); failWaiter.join()
    assert(errs.get() == 2, "both the winner and the waiter see the failure")
    assert(cache.getOrCompute("f")("recovered") == "recovered",
      "a later request retries fresh")
  }
}
