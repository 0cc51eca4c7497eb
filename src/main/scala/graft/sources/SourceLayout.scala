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

  def root(prefix: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/$prefix/${slug(sfDir)}"

  /** Run `write` only if `dir` lacks a _SUCCESS marker (i.e. no
    * completed write from this or any previous session). */
  def writeOnce(dir: String)(write: => Unit): Unit = {
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) write
  }
}
