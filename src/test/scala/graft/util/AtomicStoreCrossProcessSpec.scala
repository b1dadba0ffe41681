package graft.util

import graft.SparkSpec

/** The claim/commit protocol is DESIGNED for cross-process writers, but
  * thread-based specs share one JVM (one FileSystem cache, one resolve
  * cache). This spec launches two REAL child JVMs ([[AtomicStoreRace]])
  * racing fit cycles on one store — separate processes, separate Hadoop
  * FileSystem instances, nothing shared but the directory — while a
  * reader in this process polls the store, and asserts:
  *  - both writers complete every cycle (no crash, no wedge);
  *  - the generations they committed are fully DISJOINT (the claim step);
  *  - every reader poll sees a COMPLETE generation whose files agree on
  *    (writer, generation) — never a torn mix.
  */
class AtomicStoreCrossProcessSpec extends SparkSpec {

  private def javaBin = s"${System.getProperty("java.home")}/bin/java"

  /** Forward this JVM's --add-opens pairs (build.sbt sets them for
    * Hadoop/Spark on JDK 17) to the children.
    */
  private def addOpens: Seq[String] = {
    val in = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < in.size()) {
      val a = in.get(i)
      if (a == "--add-opens" && i + 1 < in.size()) {
        buf += a += in.get(i + 1); i += 2
      } else if (a.startsWith("--add-opens=")) { buf += a; i += 1 }
      else i += 1
    }
    buf.toSeq
  }

  test("two OS processes racing fits: disjoint generations, one winner, readers never torn") {
    val store = tmpDir() + "/xproc"
    val rounds = 6
    def launch(id: String): Process = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.util.AtomicStoreRace", store, id, rounds.toString))
      new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    }
    val pA = launch("A")
    val pB = launch("B")
    // concurrent reader: resolve + read both parts, assert agreement.
    // (Committed generations are age-gated 60 s, so a just-resolved dir
    // cannot be pruned out from under this reader mid-poll.)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      val conf = new org.apache.hadoop.conf.Configuration()
      val f = new org.apache.hadoop.fs.Path(store).getFileSystem(conf)
      def slurp(p: String): Option[String] = try {
        val in = f.open(new org.apache.hadoop.fs.Path(p))
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          Some(new String(buf, 0, math.max(n, 0), "UTF-8"))
        } finally in.close()
      } catch { case _: java.io.IOException => None }
      while (!stop.get() && torn.get() == null) {
        AtomicStore.currentGen(f, store).foreach { g =>
          val dir = AtomicStore.genDir(store, g)
          (slurp(s"$dir/part1"), slurp(s"$dir/part2")) match {
            case (Some(a), Some(b)) =>
              if (a != b) torn.set(s"gen $g torn: part1=$a part2=$b")
              else if (!a.endsWith(s":$g"))
                torn.set(s"gen $g holds foreign payload $a")
            case (a, b) =>
              torn.set(s"committed gen $g incomplete: part1=$a part2=$b")
          }
        }
        Thread.sleep(5)
      }
    })
    reader.start()
    val okA = pA.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    val okB = pB.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    stop.set(true); reader.join(10000)
    assert(okA && okB, "a racing writer process wedged")
    def lines(p: Process): Seq[(Long, String)] =
      scala.io.Source.fromInputStream(p.getInputStream).getLines().toSeq
        .filter(_.startsWith("committed "))
        .map { l => val t = l.split(" "); (t(1).toLong, t(3)) }
    val a = lines(pA); val b = lines(pB)
    assert(pA.exitValue() == 0, s"writer A failed: $a")
    assert(pB.exitValue() == 0, s"writer B failed: $b")
    assert(a.size == rounds && b.size == rounds,
      s"every cycle must complete: A=${a.size} B=${b.size}")
    val gensA = a.map(_._1).toSet; val gensB = b.map(_._1).toSet
    assert((gensA & gensB).isEmpty,
      s"claims must hand racing processes DISJOINT generations: ${gensA & gensB}")
    assert(torn.get() == null, String.valueOf(torn.get()))
    // the final resolved store is one writer's complete fit
    val g = AtomicStore.currentGen(spark, store).get
    assert(g == (gensA ++ gensB).max, "readers resolve the highest commit")
  }

  test("two OS processes contending on the mutation lease: critical " +
    "sections never overlap, both complete, rejections retry") {
    val store = tmpDir() + "/xlease"
    new java.io.File(store).mkdirs()
    // plant a crashed holder's EXPIRED lease so the first process to
    // contend goes through the arbitrated break path (marker + verify +
    // delete) cross-process, not just cross-thread — the TORN check
    // below covers the break exactly like any other acquisition
    val planted = new java.io.File(s"$store/_mutation_lease")
    java.nio.file.Files.writeString(planted.toPath, "crashed:00000000")
    assert(planted.setLastModified(System.currentTimeMillis() - 120000L))
    val rounds = 12
    def launch(id: String): Process = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.util.MutationLeaseRace", store, id, rounds.toString))
      new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    }
    val pA = launch("A")
    val pB = launch("B")
    val okA = pA.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    val okB = pB.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    assert(okA && okB, "a lease-contending process wedged")
    def out(p: Process): String =
      scala.io.Source.fromInputStream(p.getInputStream).mkString
    val (oa, ob) = (out(pA), out(pB))
    // exit 2 = a process observed a FOREIGN holder inside its own lease
    // (mutual exclusion violated); exit 0 + "done" = all rounds ran
    assert(pA.exitValue() == 0, s"A: $oa")
    assert(pB.exitValue() == 0, s"B: $ob")
    assert(oa.contains(s"rounds=$rounds") && ob.contains(s"rounds=$rounds"),
      s"every round must complete: A=$oa B=$ob")
    assert(!new java.io.File(s"$store/_mutation_lease").exists(),
      "the last holder must release the lease")
    assert(!new java.io.File(store).listFiles()
      .exists(_.getName.startsWith("_mutation_lease_break_")),
      "the planted lease's break marker must be cleaned up")
  }
}
