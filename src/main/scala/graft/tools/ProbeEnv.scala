package graft.tools

/** Shared env resolution for the fresh-JVM probes (r16 ADVICE: probes
  * defaulted SPARK_GRAFT_CPUS to "32" while Bench.main defaults to "4", so
  * an unset-env probe run was silently incomparable to the bench medians it
  * is supposed to adjudicate). Probes now resolve exactly like Bench.main
  * and warn loudly when the env var is absent.
  */
object ProbeEnv {
  def cpus: String = sys.env.get("SPARK_GRAFT_CPUS") match {
    case Some(v) => v
    case None =>
      System.err.println(
        "[probe] SPARK_GRAFT_CPUS unset; defaulting to 4 (same as Bench.main). " +
          "The driver/judge bench contract is 32 — set it explicitly for comparable warm-mins.")
      "4"
  }
}
