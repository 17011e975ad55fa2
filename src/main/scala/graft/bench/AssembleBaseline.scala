package graft.bench

/** Re-assemble BENCH/BASELINE.md from the version-controlled section
  * files (scaling_validate.md + scaling_dedup.md + NOTES.md) without
  * re-running a scaling job — for when NOTES.md gains new evidence
  * (capacity curves, probe results) between bench runs. */
object AssembleBaseline {
  def main(args: Array[String]): Unit =
    ScalingBench.assembleBaseline(java.nio.file.Paths.get("BENCH"))
}
