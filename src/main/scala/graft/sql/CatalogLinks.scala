package graft.sql

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import graft.table.CommitIO

/**
 * Catalog-level name→directory indirection (r17 review #6 — the
 * object-store `ALTER TABLE RENAME TO`): on an object store a directory
 * move is a copy+delete whose crash window materializes exactly the
 * dual-root state the E214 heal marker refuses as ambiguous, so the
 * metadata rename NEVER moves the data — it rebinds the NAME in a
 * per-namespace links map committed with the same two primitives as a
 * table commit ([[CommitIO]]):
 *
 *  - claim  = `putIfAbsent` of the next map version file
 *    (`_catalog_links/v<N>.json`) — concurrent renames serialize, losers
 *    re-read and retry;
 *  - publish = ONE full-object `putAtomic` of the HEAD pointer — readers
 *    see the old or the new map whole.
 *
 * BOTH bindings of a rename — `new → physical dir`, `old → tombstone` —
 * flip in that one publish, so no crash can leave a state where both
 * names (or neither) resolve: a crash between claim and publish leaves
 * HEAD on the old map (the rename observably did not happen; the old
 * name keeps working), and the orphaned claim is ROLLED FORWARD by the
 * next links commit (publishing an existing claim is an idempotent
 * same-bytes PUT, so racing the original writer is harmless) — the
 * rename a caller saw crash completes at the next catalog mutation, the
 * at-least-once twin of the table protocol's claim heal.
 *
 * The map entry value is the PHYSICAL directory name inside the same
 * namespace (`Some(dir)`) or a tombstone (`None` — the name no longer
 * resolves even though a directory with that name still exists: the
 * renamed table's data stays where it was written). Consequences a
 * deployment must know: the data directory permanently keeps its
 * original name, and a renamed-away name cannot host a NEW table or view
 * while the physical directory still occupies it (loud create-time
 * error; dropping the renamed table frees it — [[clearTombstone]] lifts
 * the hide on the next CREATE).
 */
object CatalogLinks {

  private val Dir = "_catalog_links"

  sealed trait Resolution
  /** The name is bound to a (possibly different) physical dir. */
  final case class Linked(physical: String) extends Resolution
  /** The name was renamed away: it must not resolve. */
  case object Tombstoned extends Resolution
  /** No entry: the name resolves to its own directory (the default). */
  case object Unlinked extends Resolution

  final case class Links(version: Long, entries: Map[String, Option[String]])

  private def linksDir(nsDir: String): Path = Paths.get(nsDir, Dir)
  private def headPath(nsDir: String): Path = linksDir(nsDir).resolve("HEAD")
  private def vPath(nsDir: String, v: Long): Path =
    linksDir(nsDir).resolve(s"v$v.json")

  /** Fast-path: namespaces that never used a metadata rename have no HEAD
    * and pay one `exists` per resolution, nothing more. */
  def read(nsDir: String): Links = {
    val head = headPath(nsDir)
    if (!Files.exists(head)) return Links(0L, Map.empty)
    val v = new String(Files.readAllBytes(head), UTF_8).trim.toLong
    if (v <= 0) return Links(0L, Map.empty)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Files.readAllBytes(vPath(nsDir, v)))
    val entries = scala.collection.mutable.Map.empty[String, Option[String]]
    node.fields().forEachRemaining { e =>
      entries.put(e.getKey,
        if (e.getValue.isNull) None else Some(e.getValue.asText()))
    }
    Links(v, entries.toMap)
  }

  def resolve(nsDir: String, name: String): Resolution =
    read(nsDir).entries.get(name) match {
      case Some(Some(phys)) => Linked(phys)
      case Some(None) => Tombstoned
      case None => Unlinked
    }

  private def serialize(entries: Map[String, Option[String]]): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    entries.toSeq.sortBy(_._1).foreach {
      case (k, Some(v)) => node.put(k, v)
      case (k, None) => node.putNull(k)
    }
    om.writeValueAsBytes(node)
  }

  /** One CAS attempt: claim the next version, publish HEAD. On a claim
    * conflict the existing claim is rolled FORWARD (same-bytes publish —
    * see the object scaladoc) and the caller re-reads. */
  private def tryCommit(nsDir: String, cur: Links,
      entries: Map[String, Option[String]], io: CommitIO): Boolean = {
    Files.createDirectories(linksDir(nsDir))
    val next = cur.version + 1
    try io.putIfAbsent(vPath(nsDir, next), serialize(entries))
    catch {
      case _: FileAlreadyExistsException =>
        io.putAtomic(headPath(nsDir), next.toString.getBytes(UTF_8))
        return false
    }
    io.putAtomic(headPath(nsDir), next.toString.getBytes(UTF_8))
    true
  }

  private def retrying(nsDir: String, io: CommitIO)(
      step: Links => Option[Map[String, Option[String]]]): Unit = {
    var attempts = 0
    while (true) {
      val cur = read(nsDir)
      step(cur) match {
        case None => return // nothing to change under the freshest map
        case Some(entries) =>
          if (tryCommit(nsDir, cur, entries, io)) return
          attempts += 1
          if (attempts > 20) throw new IllegalStateException(
            s"catalog links commit lost $attempts straight races under $nsDir")
      }
    }
  }

  /** Rebind `oldName` → `newName` in one links commit. The caller has
    * already validated existence/absence at the catalog level; this
    * re-checks against the freshest map inside the retry loop so a
    * concurrent rename cannot double-bind a name. */
  def rename(nsDir: String, oldName: String, newName: String,
      io: CommitIO): Unit =
    retrying(nsDir, io) { cur =>
      // idempotence under the roll-forward heal: a crashed attempt's claim
      // may have been published by OUR OWN conflict handler one loop ago —
      // a map that already shows (old tombstoned, new bound) IS this
      // rename applied; re-applying would double-tombstone a live chain
      if (cur.entries.get(oldName).contains(None) &&
          cur.entries.get(newName).exists(_.isDefined)) None
      else {
        val phys = cur.entries.get(oldName) match {
          case Some(Some(p)) => p
          case Some(None) => throw new IllegalStateException(
            s"rename source '$oldName' no longer resolves (renamed concurrently)")
          case None => oldName
        }
        if (cur.entries.get(newName).exists(_.isDefined))
          throw new IllegalStateException(
            s"rename target '$newName' is already bound (renamed concurrently)")
        Some(cur.entries + (newName -> Some(phys)) + (oldName -> None))
      }
    }

  /** Remove `name`'s binding (table dropped through a linked name). */
  def unlink(nsDir: String, name: String, io: CommitIO): Unit =
    retrying(nsDir, io) { cur =>
      if (cur.entries.contains(name)) Some(cur.entries - name) else None
    }

  /** Lift a tombstone so a NEW table can be created under a previously
    * renamed-away name once its directory is free. */
  def clearTombstone(nsDir: String, name: String, io: CommitIO): Unit =
    retrying(nsDir, io) { cur =>
      if (cur.entries.get(name).contains(None)) Some(cur.entries - name)
      else None
    }
}
