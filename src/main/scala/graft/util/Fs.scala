package graft.util

import java.nio.file.{Files, Path}

object Fs {
  /** Best-effort recursive delete (children before parents); missing files
    * are fine — used for scratch/spill cleanup, never for table data. The
    * walk stream is CLOSED explicitly: these run per micro-batch on
    * long-lived streams, and an unclosed DirectoryStream holds its fd until
    * GC — a slow fd leak in exactly the always-on deployment. */
  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach { f =>
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => () }
      }
    finally s.close()
  }

  /** Strict recursive delete: like [[deleteRecursively]] but REPORTS
    * partial failure instead of swallowing it — throws the first
    * IOException after attempting every entry (children before parents),
    * so a caller that must guarantee the tree is gone (DROP TABLE) never
    * reports success over a half-deleted directory. */
  def deleteRecursivelyStrict(p: Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    var firstErr: Option[java.io.IOException] = None
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach { f =>
        try Files.deleteIfExists(f)
        catch { case e: java.io.IOException =>
          if (firstErr.isEmpty) firstErr = Some(e) }
      }
    finally s.close()
    firstErr.foreach(throw _)
  }

  /** Materialize a directory listing with the stream closed (see
    * [[deleteRecursively]] on why closing matters on streaming hot paths). */
  def listSeq(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Materialize a recursive walk with the stream closed. */
  def walkSeq(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
