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

  def record(kind: String, sec: Double): Unit = { q.add((kind, sec)); () }

  /** Time `body`, record it under `kind`, return its result. */
  def timed[A](kind: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally record(kind, (System.nanoTime() - t0) / 1e9)
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[(String, Double)] = {
    val b = Seq.newBuilder[(String, Double)]
    var x = q.poll()
    while (x != null) { b += x; x = q.poll() }
    b.result()
  }
}
