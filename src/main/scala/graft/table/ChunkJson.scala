package graft.table

/**
 * Standalone, serializable parser for immutable manifest chunk files —
 * executor-side twin of the engine's private `TransactionalTable` chunk
 * loader (kept in sync by `DistributedMetadataSpec`'s content-equality
 * tests). Used by the distributed metadata scans (graft.sql) AND the
 * distributed orphan-file sweep: chunk files live under the table root on
 * the same shared storage as the data, so executors read them wherever the
 * data itself is readable.
 */
object ChunkJson {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Test-observable parse counter (per-JVM; in local mode executor-side
    * parses tick it too, so specs can assert "planning parses zero chunks,
    * execution parses exactly the matching ones"). */
  val parses = new java.util.concurrent.atomic.AtomicLong()

  /** Parse one immutable manifest chunk file — executor-side twin of the
    * engine's private `TransactionalTable.parseDataFile` chunk loader (kept
    * in sync by `DistributedMetadataSpec`'s content-equality tests). */
  def parse(path: String): IndexedSeq[DataFile] = {
    import scala.jdk.CollectionConverters._
    parses.incrementAndGet()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    node.get("files").elements().asScala.map { f =>
      DataFile(
        f.get("path").asText(),
        if (f.get("partition").isNull) None else Some(f.get("partition").asText()),
        f.get("pkMin").asLong(), f.get("pkMax").asLong(), f.get("rows").asLong(),
        if (f.has("bytes")) f.get("bytes").asLong()
        else java.nio.file.Files.size(java.nio.file.Paths.get(f.get("path").asText())),
        if (f.has("bloom")) Some(f.get("bloom").asText()) else None,
        if (!f.has("stats")) Map.empty
        else f.get("stats").properties().asScala.map { e =>
          e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
        }.toMap,
        if (f.has("specId")) f.get("specId").asInt() else 0,
        if (f.has("frid")) Some(f.get("frid").asLong()) else None)
    }.toIndexedSeq
  }
}
