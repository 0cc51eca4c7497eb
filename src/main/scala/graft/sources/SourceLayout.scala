package graft.sources

/** The ONE path sanitizer + write-once marker check shared by every
  * storage layout module (Bucketed/Partitioned/ZOrdered). Previously
  * each module carried its own copy, and two of them disagreed on the
  * regex ('.' kept in the path but collapsed in the table name), so
  * two sfDirs differing only in punctuation could map to one catalog
  * table over two different data paths — exactly the drift class a
  * single shared helper removes. With one slug, path and table name
  * always agree (adversarially-colliding dir names share BOTH, never
  * a mixed state); the driver fixtures (sf0.001/0.01/0.1) stay
  * distinct under it.
  */
object SourceLayout {

  def slug(sfDir: String): String = sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** Content stamp of the fixture dir: CRC over every parquet file's
    * (name, length, mtime, head+tail bytes), recursively. Every layout root
    * embeds it, so a driver-side fixture REGENERATION — same path, new
    * bytes; round 5's events.ts re-encode proved this happens between
    * rounds — orphans all derived layouts instead of letting the
    * _SUCCESS marker silently re-serve shingles/pairs/spans/components
    * of the OLD corpus. The sample covers the parquet footer (schema +
    * row-group metadata + its own CRC live in the tail), so a
    * regeneration that preserves every file size inside the
    * filesystem's mtime granularity — the hole an (mtime, length)-only
    * stamp leaves — still changes the stamp. Walk order is name-sorted
    * so the stamp is deterministic; a dir that vanishes or denies
    * listing mid-walk contributes nothing rather than NPEing.
    *
    * Memoized per directory for the JVM's lifetime: the stamp is read
    * several times per query (layout roots, bucketed table names), and
    * a mid-session regeneration under the SAME JVM isn't a supported
    * flow — cross-session staleness is what the stamp defends.
    */
  def sourceStamp(sfDir: String): String =
    stampCache.computeIfAbsent(sfDir, computeStamp)

  private val stampCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: drop the memoized stamp so a same-JVM regeneration
    * (unsupported in production flows) can be simulated. */
  private[graft] def uncacheStamp(sfDir: String): Unit =
    stampCache.remove(sfDir)

  private val computeStamp: java.util.function.Function[String, String] = {
    sfDir =>
      val crc = new java.util.zip.CRC32()
      def sample(f: java.io.File): Unit = {
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val len = raf.length()
          val head = new Array[Byte](math.min(64L, len).toInt)
          raf.readFully(head)
          crc.update(head)
          if (len > 64) {
            val tail = new Array[Byte](math.min(64L, len - 64).toInt)
            raf.seek(len - tail.length)
            raf.readFully(tail)
            crc.update(tail)
          }
        } finally raf.close()
      }
      def walk(f: java.io.File): Unit =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty)
            .sortBy(_.getName).foreach(walk)
        else if (f.getName.endsWith(".parquet") || f.getName == "_SUCCESS") {
          crc.update(f.getName.getBytes("UTF-8"))
          crc.update(java.nio.ByteBuffer.allocate(16)
            .putLong(f.length()).putLong(f.lastModified()).array())
          try sample(f)
          catch { case _: java.io.IOException => () } // metadata alone then
        }
      val d = new java.io.File(sfDir)
      if (d.exists()) walk(d)
      java.lang.Long.toHexString(crc.getValue)
  }

  def root(prefix: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/$prefix/${slug(sfDir)}_${sourceStamp(sfDir)}"

  /** Run `write` only if `dir` lacks a _SUCCESS marker (i.e. no
    * completed write from this or any previous session). */
  def writeOnce(dir: String)(write: => Unit): Unit = {
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) write
  }
}
