package graft.util

/** Host CPU sampling for the kernel-storm guard (r19).
  *
  * THE HOST HAS KERNEL STORMS: multi-ten-second windows of sys% 83–96
  * across all 32 cores (user ~1%, no iowait) that make any
  * shuffle-heavy timing 5–15× slow at random — documented in
  * ARCHITECTURE "Bench-drift contract". Both measurement harnesses
  * (graft.Bench, graft.Stress) sample /proc/stat around their timed
  * passes so a storm-tainted pass is either RE-MEASURED (bounded) or
  * at least DISCLOSED in the artifact, making two runs of the same
  * HEAD adjudicable from their JSON alone. */
object Host {

  /** (system-mode jiffies, total jiffies) from /proc/stat's aggregate
    * cpu line; (0, 0) where unreadable — callers' sys% then reads 0 and
    * the guard never fires (sound degradation off-Linux). The total
    * sums only fields 1–8 (user..steal): the kernel already folds
    * guest/guest_nice into user/nice, so including them would
    * double-count guest time and understate sys% on VM hosts. */
  def cpuJiffies(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      (f(2), f.take(8).sum)
    } catch { case _: Exception => (0L, 0L) }

  /** Fraction of CPU time spent in system mode between two samples;
    * 0.0 when the window is empty or unreadable. */
  def sysPct(before: (Long, Long), after: (Long, Long)): Double =
    if (after._2 > before._2)
      (after._1 - before._1).toDouble / (after._2 - before._2)
    else 0.0
}
