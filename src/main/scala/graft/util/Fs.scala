package graft.util

import java.nio.file.{Files, Path}

object Fs {
  /** Best-effort recursive delete (children before parents); missing files
    * are fine — used for scratch/spill cleanup, never for table data. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach { f =>
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => () }
      }
  }
}
