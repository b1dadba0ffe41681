package graft.bench

import graft.SparkSpec

/** The bench harness's exit-code contract (Bench.scala r17: rc 0 = gate
  * pass, rc 1 = plan-slow, rc 3 = contamination exceeded the retry
  * budget), exercised END TO END in real child Bench JVMs rather than
  * unit-faked — the r17 verdict's #6 (the rc 3 path had never fired in a
  * real run):
  *
  *  - the envelope is forced to 1 µs via `SPARK_GRAFT_GATE_SECONDS` so a
  *    fast query breaches deterministically on a quiet box;
  *  - a quiet box's iterations run steal-clean → every breach is the
  *    plan's own → gate_class "slow", rc 1;
  *  - `SPARK_GRAFT_CLEAN_THRESH=-1` makes every iteration count as
  *    steal-contaminated (any delta > -1) — the synthetic steal source —
  *    so NO breach runs clean → gate_class "contaminated", rc 3;
  *  - the default envelope passes → gate_class "pass", rc 0.
  */
class BenchGateSpec extends SparkSpec {

  private def javaBin = s"${System.getProperty("java.home")}/bin/java"

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

  /** Run one child Bench (tiny subset, sf0.001, 2 iters) and return
    * (exit code, the JSON line). The child writes its subset artifact to
    * a scratch cwd so the repo's committed bench_report.json is never
    * touched.
    */
  private def runBench(extraEnv: Map[String, String]): (Int, String) = {
    val cwd = new java.io.File(tmpDir())
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.Bench"))
    val pb = new ProcessBuilder(cmd: _*).directory(cwd)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", sfDir)
    env.put("SPARK_GRAFT_CPUS", "4")
    env.put("SPARK_GRAFT_ITERS", "2")
    env.put("SPARK_GRAFT_WARMUP", "1") // absorbs the cold first plan
    env.put("SPARK_GRAFT_ONLY", "q_region_stats")
    extraEnv.foreach { case (k, v) => env.put(k, v) }
    val proc = pb.start()
    val outLines = java.util.Collections
      .synchronizedList(new java.util.ArrayList[String]())
    def pump(in: java.io.InputStream, keep: Boolean) = {
      val t = new Thread(() => {
        val src = scala.io.Source.fromInputStream(in)
        try src.getLines().foreach(l => if (keep) { outLines.add(l); () })
        catch { case _: Throwable => () }
      })
      t.setDaemon(true); t.start(); t
    }
    val op = pump(proc.getInputStream, keep = true)
    val ep = pump(proc.getErrorStream, keep = false)
    assert(proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
      "child Bench must finish")
    op.join(10000); ep.join(10000)
    import scala.jdk.CollectionConverters._
    val json = outLines.asScala.find(_.startsWith("{\"metric\""))
      .getOrElse(fail("child Bench printed no JSON line"))
    (proc.exitValue(), json)
  }

  test("rc contract end to end: plan-slow breach → rc 1, fully-" +
    "contaminated breach → rc 3, pass → rc 0") {
    // rc 1: sub-µs envelope; the clean bar is forced HIGH so every breach
    // counts steal-clean even if a host storm lands mid-run — the leg
    // pins "a clean breach exists → plan-slow", not the box's weather
    val (rcSlow, jsonSlow) = runBench(Map(
      "SPARK_GRAFT_GATE_SECONDS" -> "0.000001",
      "SPARK_GRAFT_CLEAN_THRESH" -> "1e9"))
    assert(rcSlow == 1, s"plan-slow must exit 1, got $rcSlow\n$jsonSlow")
    assert(jsonSlow.contains("\"gate_class\":\"slow\""), jsonSlow)
    assert(jsonSlow.contains("\"pass_max_lt_2s\":false"), jsonSlow)
    // rc 3: same breach, but every iteration counts as contaminated
    // (clean bar below zero = the synthetic steal source)
    val (rcCont, jsonCont) = runBench(Map(
      "SPARK_GRAFT_GATE_SECONDS" -> "0.000001",
      "SPARK_GRAFT_CLEAN_THRESH" -> "-1",
      // keep the steal-retry leg out of the way: the clean bar is
      // synthetic, the retry trigger should stay real
      "SPARK_GRAFT_STEAL_THRESH" -> "1e9"))
    assert(rcCont == 3, s"contaminated must exit 3, got $rcCont\n$jsonCont")
    assert(jsonCont.contains("\"gate_class\":\"contaminated\""), jsonCont)
    // rc 0: a passing envelope on the same query (generous — 30 s — so a
    // host steal storm during the sf0.001 run cannot flake the PASS leg;
    // the envelope VALUE is the two legs above's concern, this leg pins
    // the exit-0 plumbing)
    val (rcPass, jsonPass) = runBench(Map(
      "SPARK_GRAFT_GATE_SECONDS" -> "30"))
    assert(rcPass == 0, s"pass must exit 0, got $rcPass\n$jsonPass")
    assert(jsonPass.contains("\"gate_class\":\"pass\""), jsonPass)
  }
}
