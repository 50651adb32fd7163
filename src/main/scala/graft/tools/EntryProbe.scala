package graft.tools

import graft.Bench

/** Time ONE driver-contract query ([[graft.SparkEntry.queries]]) by
  * name over a testdata SF dir — the non-headline analog of
  * [[QueryProbe]] (which profiles bench headline queries). A 4th
  * `explain` arg prints the formatted physical plan before timing
  * (the plan-audit loop: check codegen spans / partial aggs /
  * exchange payloads after landing an operator).
  *
  *   sbt "runMain graft.tools.EntryProbe q_suffixarray_pairs /root/testdata/sf0.1 32"
  *   sbt "runMain graft.tools.EntryProbe q_prefix_dup /root/testdata/sf0.01 8 explain"
  */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val qname = if (args.length > 0) args(0) else "q_turn_dedup"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(qname)
    if (args.length > 3 && args(3) == "explain") fn(spark, sfDir).explain("formatted")
    // warm pass (JIT + codegen), then a timed pass — same discipline as Bench
    fn(spark, sfDir).count()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[entryprobe] $qname rows=$n wall=$secs%.2fs (warm)")
    spark.stop()
  }
}
