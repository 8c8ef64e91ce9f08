package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic tiny-file metadata IO — the ONE implementation behind every
  * single-file fence and registry (the DSv2 sink's epoch fence, [[JoinMv]]'s
  * agg fence, [[DynamicPipeline]]'s schema registry).
  *
  * Write protocol: content goes to a hidden temp sibling, then
  * delete-existing + rename. Delete+rename is NOT atomic on every
  * filesystem; a crash in the gap leaves NO file, which every caller treats
  * as "not yet written" — costing one redundant idempotent redo on replay,
  * never a torn read (a reader sees either the old complete file, the new
  * complete file, or nothing). Temp names carry a UUID so concurrent
  * writers of the same path never collide on the temp.
  */
private[graft] object MetaFile {

  def write(fs: FileSystem, path: Path, content: String): Unit = {
    fs.mkdirs(path.getParent)
    val tmp = new Path(path.getParent,
      s".${path.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(s"meta file write failed: $tmp -> $path")
  }

  def read(fs: FileSystem, path: Path): Option[String] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
}
