package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Multi-client concurrent fuzz of [[Cache.CacheServer]] — the leg the
  * r15 model-based LRU fuzz did not cover: N real TCP sessions
  * interleaving GET/PUT/DEL/CLEAR while a chaos client injects the
  * protocol's failure modes (mid-body disconnects, garbage lines,
  * oversized declared lengths, connect/close storms).
  *
  * The correctness property is linearizability-style under the regime
  * where it is checkable without a full history checker: one designated
  * WRITER per key publishes an acked watermark after each OK reply, and
  * every reader asserts a GET started after watermark `n` returns a
  * value with sequence ≥ `n` (the backing store is one synchronized map,
  * so an acked write must be visible to any later-starting read — a
  * stale or missing value means a lost update or protocol desync; a
  * value for the WRONG key means body bytes bled across sessions).
  */
class CacheServerConcurrencySpec extends AnyFunSuite {

  private def openFds(): Int =
    try new java.io.File("/proc/self/fd").list().length
    catch { case _: Throwable => -1 }

  test("8 sessions + chaos client: monotonic reads per key, no desync, no fd leak") {
    val backend = new Cache.LruBackend(maxEntries = 10000, ttlSeconds = 86400)
    val server = new Cache.CacheServer(backend).start()
    val port = server.boundPort
    val fds0 = openFds()
    try {
      val nKeys = 8
      val writesPerKey = 150
      val readsPerReader = 300
      // acked(k) = highest sequence whose PUT the writer has seen OK'd
      val acked = new java.util.concurrent.atomic.AtomicLongArray(nKeys)
      (0 until nKeys).foreach(k => acked.set(k, -1L))
      val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

      def value(k: Int, seq: Long) = s"key$k:seq$seq:" + ("x" * (seq % 64).toInt)

      val writers = (0 until nKeys).map { k =>
        new Thread(() => {
          val net = new Cache.NetBackend("127.0.0.1", port)
          try {
            (0L until writesPerKey).foreach { seq =>
              net.put(s"well:$k", value(k, seq), 86400)
              acked.set(k, seq) // published AFTER the OK reply
            }
          } catch {
            case e: Throwable => violations.add(s"writer $k died: $e")
          } finally net.close()
        }, s"writer-$k")
      }

      val readers = (0 until 8).map { r =>
        new Thread(() => {
          val rnd = new scala.util.Random(1000 + r)
          val net = new Cache.NetBackend("127.0.0.1", port)
          try {
            (0 until readsPerReader).foreach { _ =>
              val k = rnd.nextInt(nKeys)
              val watermark = acked.get(k) // read BEFORE the GET starts
              net.get(s"well:$k") match {
                case Some(v) =>
                  if (!v.startsWith(s"key$k:seq"))
                    violations.add(s"reader $r: cross-key bleed on $k: '${v.take(40)}'")
                  else {
                    val seq = v.split(":")(1).stripPrefix("seq").toLong
                    if (seq < watermark)
                      violations.add(
                        s"reader $r: stale read on $k: seq $seq < acked $watermark")
                  }
                case None =>
                  if (watermark >= 0)
                    violations.add(s"reader $r: lost update on $k (acked $watermark)")
              }
            }
          } catch {
            case e: Throwable => violations.add(s"reader $r died: $e")
          } finally net.close()
        }, s"reader-$r")
      }

      // chaos: raw-socket malformed traffic + connect/close storms +
      // CLEAR races, all on a DISJOINT key prefix so the property keys
      // are never legitimately deleted
      val chaos = new Thread(() => {
        val rnd = new scala.util.Random(42)
        val net = new Cache.NetBackend("127.0.0.1", port)
        try {
          while (!stop.get()) {
            rnd.nextInt(6) match {
              case 0 => // mid-body disconnect: declared 100, send 10, slam shut
                val s = new java.net.Socket("127.0.0.1", port)
                s.getOutputStream.write("PUT chaoskey 60 100\nshortbody".getBytes("UTF-8"))
                s.getOutputStream.flush(); s.close()
              case 1 => // garbage line + immediate close
                val s = new java.net.Socket("127.0.0.1", port)
                s.getOutputStream.write(
                  Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
                s.close()
              case 2 => // huge declared length, disconnect mid-drain
                val s = new java.net.Socket("127.0.0.1", port)
                s.getOutputStream.write(s"PUT chaoskey 60 ${64 << 20}\n".getBytes("UTF-8"))
                s.getOutputStream.write(Array.fill(1000)('A'.toByte))
                s.getOutputStream.flush(); s.close()
              case 3 => // connect/close storm (the EMFILE-pressure shape)
                (0 until 20).foreach { _ =>
                  val s = new java.net.Socket("127.0.0.1", port); s.close()
                }
              case 4 => // legitimate ops on the chaos prefix, incl CLEAR race
                try {
                  net.put(s"chaos:${rnd.nextInt(4)}", "v" * rnd.nextInt(100), 60)
                  net.clearPrefix("chaos:")
                } catch { case _: Throwable => () } // redialed next call
              case _ => // PUT whose BODY looks like protocol commands
                try net.put(s"chaos:cmd", "DEL well:0\nCLEAR well:\nPING\n", 60)
                catch { case _: Throwable => () }
            }
          }
        } finally net.close()
      }, "chaos")

      (writers ++ readers).foreach(_.start())
      chaos.start()
      (writers ++ readers).foreach(_.join(60000))
      stop.set(true)
      chaos.join(10000)
      assert(violations.isEmpty, s"violations: ${violations.toArray.take(10).mkString("; ")}")

      // quiescent convergence: the final acked value of every key is what
      // a fresh session reads, and the command-lookalike body never
      // executed (well:0 still present, chaos CLEARs never touched well:)
      val check = new Cache.NetBackend("127.0.0.1", port)
      try {
        (0 until nKeys).foreach { k =>
          val got = check.get(s"well:$k")
          assert(got.contains(value(k, writesPerKey - 1L)),
            s"key $k did not converge: ${got.map(_.take(30))}")
        }
        assert(check.ping())
      } finally check.close()
    } finally server.stop()
    // fd hygiene: the storm of half-open/slammed connections must not
    // leak descriptors (every serve() path closes its socket in finally)
    Thread.sleep(200); System.gc(); Thread.sleep(200)
    val fds1 = openFds()
    if (fds0 > 0 && fds1 > 0)
      assert(fds1 <= fds0 + 25, s"fd leak: $fds0 -> $fds1")
  }

  test("accept loop survives fd-exhaustion-style accept failures and keeps serving") {
    val server = new Cache.CacheServer(new Cache.LruBackend()).start()
    val port = server.boundPort
    try {
      // saturate with abandoned half-open connections, then assert a new
      // well-formed session still round-trips (the accept loop backs off
      // on IOException instead of dying or spinning)
      val abandoned = (0 until 100).map { _ =>
        val s = new java.net.Socket("127.0.0.1", port)
        s.getOutputStream.write("PUT k 60 999999999\npartial".getBytes("UTF-8"))
        s.getOutputStream.flush()
        s
      }
      val net = new Cache.NetBackend("127.0.0.1", port)
      try {
        net.put("alive", "yes", 60)
        assert(net.get("alive").contains("yes"))
      } finally net.close()
      abandoned.foreach(s => try s.close() catch { case _: Throwable => () })
      val net2 = new Cache.NetBackend("127.0.0.1", port)
      try assert(net2.get("alive").contains("yes")) finally net2.close()
    } finally server.stop()
  }
}
