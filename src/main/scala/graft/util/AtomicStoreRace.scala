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
