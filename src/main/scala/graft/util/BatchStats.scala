package graft.util

/**
 * Process-global per-batch wall-time collector behind the bench's
 * streaming-tier FRESHNESS metric: checkpointed multi-commit pipelines
 * (CDC replay, incremental index builds) are excluded from the per-query
 * DuckDB ratio by design — their operative number is seconds per
 * micro-batch against the reference's 100 s trigger bound, which the batch
 * kernels record here (one enqueue per BATCH — nanoseconds of overhead
 * against a commit that writes files). `Bench` drains the queue around each
 * streaming-tier query and publishes p50/p95 per query.
 */
object BatchStats {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Bound for an UNDRAINED queue: outside the bench nothing calls
    * [[drain]], and a long-running pipeline (the 864-commits/day posture)
    * must not leak one tuple per batch forever. Past the cap the OLDEST
    * sample drops — recent batches are the ones a late-attaching drainer
    * wants. 16k samples ≈ 18 days of 100 s batches, ~1 MiB. */
  private val MaxPending = 16384

  def record(kind: String, sec: Double): Unit = {
    q.add((kind, sec))
    if (n.incrementAndGet() > MaxPending && q.poll() != null) n.decrementAndGet()
    ()
  }

  /** Time `body`, record it under `kind`, return its result. */
  def timed[A](kind: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally record(kind, (System.nanoTime() - t0) / 1e9)
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[(String, Double)] = {
    val b = Seq.newBuilder[(String, Double)]
    var x = q.poll()
    while (x != null) { b += x; n.decrementAndGet(); x = q.poll() }
    b.result()
  }
}
