package graft.util

/** Cross-process exercise harness for [[AtomicStore]]: ONE writer process
  * performing `rounds` fit cycles against a shared store path — no
  * SparkSession, just the Hadoop local filesystem, so two of these JVMs
  * race the actual claim/commit protocol the way two cluster drivers
  * would. Each cycle: begin → write a two-file "fit" into the generation
  * directory (with a deliberate pause between the files to widen the
  * interleave window) → commit. A torn store would pair one writer's
  * `part1` with another's `part2`; the spec's concurrent reader asserts
  * they always agree.
  *
  * Usage: AtomicStoreRace <storePath> <writerId> <rounds>
  * Prints one `committed <gen> by <writerId>` line per cycle; exits 0.
  * Driven by AtomicStoreCrossProcessSpec.
  */
object AtomicStoreRace {
  def main(args: Array[String]): Unit = {
    val Array(path, writerId, roundsS) = args
    val rounds = roundsS.toInt
    val conf = new org.apache.hadoop.conf.Configuration()
    val f = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    (1 to rounds).foreach { _ =>
      val (gen, gdir) = AtomicStore.begin(f, path)
      def write(name: String): Unit = {
        val o = f.create(new org.apache.hadoop.fs.Path(s"$gdir/$name"), false)
        try o.write(s"$writerId:$gen".getBytes("UTF-8")) finally o.close()
      }
      write("part1")
      Thread.sleep(15 + (gen % 4) * 10) // widen the cross-writer window
      write("part2")
      AtomicStore.commit(f, path, gen,
        AtomicStore.DefaultCommittedGraceMs, AtomicStore.DefaultClaimGraceMs)
      println(s"committed $gen by $writerId")
    }
  }
}

/** Cross-process exercise for the MUTATION LEASE
  * ([[AtomicStore.withMutationLease]]): one process looping `rounds`
  * lease-held critical sections against a shared store path. Inside the
  * lease it stamps a shared `critical` file with its id, holds for 20 ms,
  * and reads it back — if another process ever held the lease
  * concurrently, the stamp is foreign and the process exits 2 ("TORN").
  * A rejection (`IllegalStateException` — the other process holds the
  * lease) is the EXPECTED contention outcome: retry after a pause.
  *
  * Usage: MutationLeaseRace <storePath> <id> <rounds>
  * Prints `done <id> rounds=<n> rejected=<m>`; exits 0, or 2 on a torn
  * critical section. Driven by AtomicStoreCrossProcessSpec.
  */
object MutationLeaseRace {
  def main(args: Array[String]): Unit = {
    val Array(path, id, roundsS) = args
    val rounds = roundsS.toInt
    val conf = new org.apache.hadoop.conf.Configuration()
    val f = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val crit = new org.apache.hadoop.fs.Path(s"$path/critical")
    var done = 0
    var rejected = 0
    while (done < rounds) {
      try {
        AtomicStore.withMutationLease(f, path, id, 60000L) {
          val o = f.create(crit, true)
          try o.write(id.getBytes("UTF-8")) finally o.close()
          Thread.sleep(20)
          val in = f.open(crit)
          val buf = new Array[Byte](id.getBytes("UTF-8").length)
          try in.readFully(0, buf) finally in.close()
          if (new String(buf, "UTF-8") != id) {
            println(s"TORN: $id saw a foreign holder inside its lease")
            sys.exit(2)
          }
        }
        done += 1
      } catch {
        case _: IllegalStateException =>
          rejected += 1; Thread.sleep(10)
      }
    }
    println(s"done $id rounds=$done rejected=$rejected")
  }
}
