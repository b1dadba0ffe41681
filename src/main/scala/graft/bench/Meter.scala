package graft.bench

/** Shared measurement probes for the bench harness ([[graft.Bench]]) and
  * the fresh-JVM upscale child ([[UpscaleProbe]]): host-steal attribution,
  * stop-the-world GC time, JIT/code-cache occupancy, and the bounded
  * contention deferral both suites preflight with.
  */
object Meter {

  /** Guest-visible host interference: cumulative steal+iowait seconds
    * from /proc/stat (steal = vCPU runnable but not scheduled by the
    * host — the r9/r10 tail-stall diagnosis; see SCALE.md). Summed over
    * all CPUs; monotonic, so per-iteration deltas attribute a stall to
    * the box rather than to the query under test.
    */
  def stealIoSeconds(): Double = try {
    val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get.trim.split("\\s+")
    // fields: user nice sys idle iowait irq softirq steal
    (cpu(5).toLong + cpu(8).toLong) / 100.0
  } catch { case _: Throwable => 0.0 }

  /** Steal+iowait RATE (cpu-s per wall second, summed over all CPUs)
    * over a short sample window — the contention preflight's evidence.
    */
  def stealRate(sampleMs: Long = 2000L): Double = {
    val s0 = stealIoSeconds(); Thread.sleep(sampleMs)
    (stealIoSeconds() - s0) / (sampleMs / 1000.0)
  }

  /** Cumulative stop-the-world GC seconds in this JVM — the OTHER
    * adjudicating evidence for a tail (r15): a stall whose own window
    * shows ~0 steal but ~1 s of GC is JVM garbage pressure, not the plan
    * under test.
    */
  private val gcBeans =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
  def gcSeconds(): Double = {
    var ms = 0L
    gcBeans.forEach(b => { val t = b.getCollectionTime; if (t > 0) ms += t })
    ms / 1000.0
  }

  /** JIT code-cache occupancy (MB) — the r14 upscale adjudication
    * instrumentation: a saturated CodeCache silently disables compilation
    * and newly generated operators run interpreted (~20×).
    */
  private val codeHeaps = java.lang.management.ManagementFactory
    .getMemoryPoolMXBeans.stream
    .filter(p => p.getName.startsWith("CodeHeap") || p.getName == "Code Cache")
    .collect(java.util.stream.Collectors
      .toList[java.lang.management.MemoryPoolMXBean])
  def codeCacheMb: Double = {
    var used = 0L
    codeHeaps.forEach(p => used += p.getUsage.getUsed)
    used / 1e6
  }

  private val jitBean =
    java.lang.management.ManagementFactory.getCompilationMXBean
  def jitMs: Long =
    if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
      jitBean.getTotalCompilationTime else -1L

  /** Bounded deferral while the box is visibly loaded (the r16 upscale
    * preflight, shared by the gate suite since r17): sample the steal
    * rate; while it exceeds `contendedRate` cpu-s/s, wait `stepMs` and
    * re-sample, at most `maxSteps` times. Returns the final rate and how
    * many steps were taken — both belong in the round artifact so a
    * contended round self-reports the regime it measured under.
    */
  def deferWhileContended(label: String,
                          contendedRate: Double = 0.25,
                          maxSteps: Int = 3,
                          stepMs: Long = 30000L): (Double, Int) = {
    var rate = stealRate()
    var steps = 0
    while (rate > contendedRate && steps < maxSteps) {
      System.err.println(f"[bench] $label: steal rate $rate%.2f cpu-s/s > " +
        f"$contendedRate — deferring ${stepMs / 1000} s (${steps + 1}/$maxSteps)")
      Thread.sleep(stepMs); steps += 1; rate = stealRate()
    }
    (rate, steps)
  }
}
