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

  /** Pluggable store behind the response cache — the seam where the
    * reference swaps Redis for its in-memory fallback (`api/cache.py:
    * 28-177` RedisCache vs `:282-317` InMemoryCache). Implementations
    * may throw: callers that must never fail a request go through
    * [[ResilientCache]], which degrades to compute on backend errors
    * (the reference's `except RedisError: return None` contract).
    */
  trait CacheBackend {
    def get(key: String): Option[String]
    def put(key: String, value: String, ttlSeconds: Long): Unit
    def delete(key: String): Boolean
    def clearPrefix(prefix: String): Int
    def entryCount: Int
    /** For /api/v1/info's `"cache"` capability string. */
    def describe: String
  }

  /** In-process backend: the [[LruCache]] behind the [[CacheBackend]]
    * seam (the reference's InMemoryCache fallback).
    */
  final class LruBackend(maxEntries: Int = 1024, ttlSeconds: Long = 3600,
                         clock: () => Long = () => Instant.now.getEpochSecond)
      extends CacheBackend {
    private val lru = new LruCache[String](maxEntries, ttlSeconds, clock)
    def get(key: String): Option[String] = lru.get(key)
    def put(key: String, value: String, ttlSeconds: Long): Unit =
      lru.put(key, value, ttlSeconds)
    def delete(key: String): Boolean = lru.delete(key)
    def clearPrefix(prefix: String): Int = lru.clearPrefix(prefix)
    def entryCount: Int = lru.stats.entries
    def describe: String = "in-memory-lru"
  }

  /** Process-external backend over a shared directory — the slot the
    * reference fills with Redis (`api/cache.py:28-177`). One file per
    * entry (`<urlenc(key)>.cache`, first line = expiry epoch-seconds,
    * rest = payload), written atomically via temp-file + move so
    * concurrent uvicorn-style worker processes never observe a torn
    * value. Expired entries are deleted lazily on read, like Redis TTL
    * from the caller's perspective. All I/O errors propagate — wrap in
    * [[ResilientCache]] for the degrade-to-compute serving contract.
    */
  final class FileBackend(dir: java.nio.file.Path,
                          clock: () => Long = () => Instant.now.getEpochSecond)
      extends CacheBackend {
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(dir)

    private def enc(key: String) =
      java.net.URLEncoder.encode(key, "UTF-8") + ".cache"
    private def dec(fileName: String) =
      java.net.URLDecoder.decode(fileName.stripSuffix(".cache"), "UTF-8")

    def get(key: String): Option[String] = {
      val p = dir.resolve(enc(key))
      // no exists() pre-check: another worker process (the multi-process
      // design this backend serves) can delete the same expired entry
      // between a check and the read — a vanished file is a MISS, and it
      // must not count as a backend error (ResilientCache would trip into
      // degraded bypass on three such benign races)
      val bytes = try Files.readAllBytes(p) catch {
        case _: java.nio.file.NoSuchFileException => return None
      }
      val body = new String(bytes, "UTF-8")
      val nl = body.indexOf('\n')
      // a corrupt/foreign file (no newline, or a non-numeric first line)
      // is as benign as a vanished one: treat it as a miss and remove it,
      // never as a backend error that counts toward degraded bypass
      val expiresAt =
        if (nl <= 0) None
        else body.substring(0, nl).toLongOption
      expiresAt match {
        case None => Files.deleteIfExists(p); None
        case Some(exp) if exp < clock() => Files.deleteIfExists(p); None
        case Some(_) => Some(body.substring(nl + 1))
      }
    }

    def put(key: String, value: String, ttlSeconds: Long): Unit = {
      val tmp = Files.createTempFile(dir, ".put", ".tmp")
      Files.write(tmp, ((clock() + ttlSeconds).toString + "\n" + value).getBytes("UTF-8"))
      Files.move(tmp, dir.resolve(enc(key)), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    def delete(key: String): Boolean = Files.deleteIfExists(dir.resolve(enc(key)))

    def clearPrefix(prefix: String): Int = {
      val stream = Files.list(dir)
      try {
        val it = stream.iterator()
        var n = 0
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (name.endsWith(".cache") && dec(name).startsWith(prefix) &&
            Files.deleteIfExists(p)) n += 1
        }
        n
      } finally stream.close()
    }

    def entryCount: Int = {
      val stream = Files.list(dir)
      try {
        val it = stream.iterator()
        var n = 0
        while (it.hasNext) if (it.next().getFileName.toString.endsWith(".cache")) n += 1
        n
      } finally stream.close()
    }

    def describe: String = s"file:$dir"
  }

  /** Shared cache NODE: any [[CacheBackend]] served over TCP with a
    * minimal line protocol — the multi-host slot the reference fills
    * with Redis (`api/cache.py:28-177`). One process runs
    * `new CacheServer(new LruBackend(...)).start()`; every serving host
    * points a [[NetBackend]] at it (behind [[ResilientCache]], so a dead
    * cache node degrades requests to compute, never fails them).
    *
    * Protocol (text line + optional length-prefixed body; keys are
    * URL-encoded so they never contain spaces):
    * {{{
    *   GET <key>            → HIT <len>\n<bytes> | MISS
    *   PUT <key> <ttl> <len>\n<bytes> → OK
    *   DEL <key>            → DEL 1|0
    *   CLEAR <prefix>       → CLEAR <n>
    *   COUNT                → COUNT <n>
    *   PING                 → PONG
    * }}}
    */
  final class CacheServer(backend: CacheBackend, port: Int = 0,
                          maxValueBytes: Int = 16 << 20) {
    private val server = new java.net.ServerSocket(port)
    server.setReuseAddress(true)
    @volatile private var running = true
    private val pool = java.util.concurrent.Executors.newCachedThreadPool()
    // open client connections, closed on stop(): a blocking read is not
    // interruptible, so shutdownNow alone would leave old connections
    // silently serving a "stopped" node
    private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.Socket]()

    def boundPort: Int = server.getLocalPort

    def start(): CacheServer = {
      pool.submit(new Runnable {
        def run(): Unit = while (running) {
          try {
            val sock = server.accept()
            live.add(sock)
            pool.submit(new Runnable { def run(): Unit = serve(sock) })
          } catch {
            case _: Throwable if !running => ()
            case _: java.io.IOException =>
              // a persistent accept failure (EMFILE under fd exhaustion)
              // must not busy-spin the accept thread at full CPU — brief
              // backoff lets handlers release descriptors
              try Thread.sleep(100) catch { case _: InterruptedException => () }
          }
        }
      })
      this
    }

    private def serve(sock: java.net.Socket): Unit = {
      try {
        sock.setTcpNoDelay(true)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        def readLine(): String = {
          // hard cap: a client streaming bytes with no newline must not
          // grow the buffer until the shared cache node OOMs — commands
          // are a verb + URL-encoded key + two numbers, never near 64 KiB
          val maxLine = 64 * 1024
          val sb = new StringBuilder
          var c = in.read()
          while (c != -1 && c != '\n') {
            if (sb.length >= maxLine)
              sys.error(s"command line over $maxLine bytes — dropping connection")
            sb.append(c.toChar); c = in.read()
          }
          if (c == -1 && sb.isEmpty) null else sb.toString
        }
        def reply(s: String): Unit = { out.write(s.getBytes("UTF-8")); out.write('\n'); out.flush() }
        var line = readLine()
        while (line != null) {
          val parts = line.split(" ")
          try parts(0) match {
            case "GET" => backend.get(dec(parts(1))) match {
              case Some(v) =>
                val bytes = v.getBytes("UTF-8")
                reply(s"HIT ${bytes.length}"); out.write(bytes); out.flush()
              case None => reply("MISS")
            }
            case "PUT" =>
              // parse as Long: a declared length over Int.MaxValue must
              // reach the drain path below, not throw out of it — the
              // NonFatal catch would reply ERR *without* draining and the
              // in-flight body would execute as commands (protocol
              // desync). A non-numeric length is unrecoverable (there is
              // no trustworthy body length to drain): close the
              // connection instead.
              // any failure to obtain a length — non-numeric OR a short
              // line with the body already in flight — is unrecoverable:
              // escape the per-command NonFatal catch (ControlThrowable)
              // so the connection closes instead of replying ERR on a
              // desynced stream
              if (parts.length < 4) throw new DesyncClose
              val len = try parts(3).toLong catch {
                case _: NumberFormatException => throw new DesyncClose
              }
              if (len > maxValueBytes || len < 0) {
                // the value body is already in flight: DRAIN it before the
                // error reply, or its bytes would be parsed as commands and
                // a value line starting with DEL/CLEAR would execute —
                // protocol desync turned cache corruption
                var rem = math.max(len, 0L)
                val skip = new Array[Byte](64 << 10)
                while (rem > 0) {
                  val n = in.read(skip, 0, math.min(rem, skip.length.toLong).toInt)
                  if (n < 0) rem = 0 else rem -= n
                }
                reply(s"ERR value of $len bytes exceeds cap")
              } else {
                val buf = new Array[Byte](len.toInt)
                in.readFully(buf)
                backend.put(dec(parts(1)), new String(buf, "UTF-8"), parts(2).toLong)
                reply("OK")
              }
            case "DEL" => reply(s"DEL ${if (backend.delete(dec(parts(1)))) 1 else 0}")
            case "CLEAR" => reply(s"CLEAR ${backend.clearPrefix(dec(parts(1)))}")
            case "COUNT" => reply(s"COUNT ${backend.entryCount}")
            case "PING" => reply("PONG")
            case other => reply(s"ERR unknown command $other")
          } catch {
            case scala.util.control.NonFatal(e) =>
              reply(s"ERR ${e.getMessage}")
          }
          line = readLine()
        }
      } catch {
        case _: DesyncClose => () // unparseable body length: drop the connection
        case scala.util.control.NonFatal(_) => ()
      }
      finally { sock.close(); live.remove(sock) }
    }

    /** Signals an unrecoverable protocol desync (no trustworthy body
      * length to drain); ControlThrowable so the per-command NonFatal
      * catch cannot convert it into an ERR reply on a desynced stream.
      */
    private final class DesyncClose extends scala.util.control.ControlThrowable

    private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

    def stop(): Unit = {
      running = false
      server.close()
      live.forEach(s => try s.close() catch { case _: Throwable => () })
      pool.shutdownNow()
    }
  }

  /** Client side of [[CacheServer]]'s protocol: a [[CacheBackend]] over
    * one persistent TCP connection, re-dialed on error. Aggressive
    * timeouts (500 ms connect, 2 s read) keep a hung cache node from
    * stalling the serving path — [[ResilientCache]] sees the timeout as
    * an error and degrades to compute.
    */
  final class NetBackend(host: String, port: Int,
                         connectMillis: Int = 500, readMillis: Int = 2000)
      extends CacheBackend {
    private var sock: java.net.Socket = _
    private var in: java.io.DataInputStream = _
    private var out: java.io.BufferedOutputStream = _

    private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

    private def ensure(): Unit =
      if (sock == null || !sock.isConnected || sock.isClosed) {
        val s = new java.net.Socket()
        s.connect(new java.net.InetSocketAddress(host, port), connectMillis)
        s.setSoTimeout(readMillis)
        s.setTcpNoDelay(true)
        sock = s
        in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(s.getInputStream))
        out = new java.io.BufferedOutputStream(s.getOutputStream)
      }

    private def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
      if (c == -1) throw new java.io.EOFException("cache node closed connection")
      sb.toString
    }

    /** One request/response; on ANY failure the connection is torn down
      * (so the next call re-dials) and the error propagates to
      * [[ResilientCache]]'s degrade logic.
      */
    private def call[A](send: => Unit)(recv: String => A): A = synchronized {
      try {
        ensure()
        send; out.flush()
        val line = readLine()
        if (line.startsWith("ERR")) sys.error(line)
        recv(line)
      } catch {
        case e: Throwable =>
          if (sock != null) { try sock.close() catch { case _: Throwable => () }; sock = null }
          throw e
      }
    }

    def get(key: String): Option[String] =
      call(out.write(s"GET ${enc(key)}\n".getBytes("UTF-8"))) { line =>
        if (line == "MISS") None
        else {
          val len = line.stripPrefix("HIT ").toInt
          val buf = new Array[Byte](len)
          in.readFully(buf)
          Some(new String(buf, "UTF-8"))
        }
      }

    def put(key: String, value: String, ttlSeconds: Long): Unit = {
      val bytes = value.getBytes("UTF-8")
      call {
        out.write(s"PUT ${enc(key)} $ttlSeconds ${bytes.length}\n".getBytes("UTF-8"))
        out.write(bytes)
      } { line => require(line == "OK", s"unexpected PUT reply $line") }
    }

    def delete(key: String): Boolean =
      call(out.write(s"DEL ${enc(key)}\n".getBytes("UTF-8")))(_ == "DEL 1")

    def clearPrefix(prefix: String): Int =
      call(out.write(s"CLEAR ${enc(prefix)}\n".getBytes("UTF-8")))(
        _.stripPrefix("CLEAR ").toInt)

    def entryCount: Int =
      call(out.write("COUNT\n".getBytes("UTF-8")))(_.stripPrefix("COUNT ").toInt)

    def ping(): Boolean =
      call(out.write("PING\n".getBytes("UTF-8")))(_ == "PONG")

    def close(): Unit = synchronized {
      if (sock != null) { try sock.close() catch { case _: Throwable => () }; sock = null }
    }

    def describe: String = s"net:$host:$port"
  }

  final case class ResilientStats(hits: Long, misses: Long, errors: Long,
                                  degraded: Boolean)

  /** The serving-side cache front: memoization over any [[CacheBackend]]
    * with the reference's graceful-degradation contract (`api/cache.py`:
    * every Redis error is caught and the request falls through to
    * compute — a broken cache slows responses, it never fails them).
    * After `maxErrors` consecutive backend failures the backend is
    * bypassed entirely (degraded mode, `connect`-failure analog) until
    * a later probe succeeds.
    */
  final class ResilientCache(backend: CacheBackend, ttlSeconds: Long = 3600,
                             maxErrors: Int = 3) {
    private var hits = 0L
    private var misses = 0L
    private var errors = 0L
    private var consecutiveErrors = 0
    private var bypassed = 0L

    private def attempt[A](op: => A): Option[A] = {
      val skip = synchronized {
        // degraded: skip the backend, but probe it every 16th call so a
        // recovered backend is picked back up without a restart
        val s = consecutiveErrors >= maxErrors && (bypassed % 16) != 15
        if (s) bypassed += 1 else bypassed = 0
        s
      }
      if (skip) None
      else {
        try { val a = op; synchronized { consecutiveErrors = 0 }; Some(a) }
        catch {
          case scala.util.control.NonFatal(_) =>
            synchronized { errors += 1; consecutiveErrors += 1 }
            None
        }
      }
    }

    /** In-flight computations, one future per key — SINGLE-FLIGHT
      * (r18): without it, every concurrent request missing the same key
      * computed it independently (measured: 16 clients over 28 distinct
      * keys produced 170 computes and a 36 s p99 — the thundering herd;
      * SCALE.md "serve_concurrent"). The winner computes; concurrent
      * missers await its outcome. A failed compute propagates to its
      * waiters (same error, no duplicate work) and clears the slot so a
      * LATER request retries fresh.
      */
    private val inFlight = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.CompletableFuture[String]]()

    def getOrCompute(key: String)(compute: => String): String =
      attempt(backend.get(key)).flatten match {
        case Some(v) => synchronized { hits += 1 }; v
        case None =>
          val mine = new java.util.concurrent.CompletableFuture[String]()
          val existing = inFlight.putIfAbsent(key, mine)
          if (existing == null) {
            try {
              synchronized { misses += 1 }
              val v =
                try compute
                catch { case e: Throwable =>
                  mine.completeExceptionally(e); throw e }
              attempt(backend.put(key, v, ttlSeconds))
              mine.complete(v)
              v
            } finally {
              // belt-and-braces: if anything escaped BETWEEN the compute
              // and complete(v) — an interrupt thrown past attempt()'s
              // NonFatal catch, an OOM — the waiters must not block
              // forever on a future nobody will ever complete
              if (!mine.isDone) {
                mine.completeExceptionally(new IllegalStateException(
                  s"single-flight winner for '$key' died before completing"))
                ()
              }
              inFlight.remove(key, mine); ()
            }
          } else {
            // share the winner's outcome; a shared result is a hit on
            // the in-flight computation (misses counts actual computes)
            try {
              val v = existing.join()
              synchronized { hits += 1 }
              v
            } catch {
              case e: java.util.concurrent.CompletionException =>
                throw Option(e.getCause).getOrElse(e)
            }
          }
      }

    def stats: ResilientStats = synchronized {
      ResilientStats(hits, misses, errors, consecutiveErrors >= maxErrors)
    }

    def describe: String = backend.describe
  }
}
