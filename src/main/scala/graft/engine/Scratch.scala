package graft.engine

import org.apache.spark.sql.SparkSession

/** Per-session scratch paths for queries that exercise write paths (CSV
  * ingest, sink round-trips, streaming checkpoints).
  *
  * Keyed by BOTH the Spark applicationId and the scale-dir leaf: the sf
  * leaf keeps concurrent scale factors apart, and the applicationId keeps
  * concurrent DRIVERS apart — without it, a bench and a verify running
  * against the same sf dir on one box would rm each other's checkpoints
  * and sink directories mid-run (spurious failures / wrong read-backs).
  */
object Scratch {
  def dir(s: SparkSession, sfDir: String, tag: String): String =
    s"/tmp/graft_scratch/${s.sparkContext.applicationId}/" +
      s"${new java.io.File(sfDir).getName}_$tag"

  /** Recursive local delete for staged scratch paths — the one shared copy
    * of the helper the write-path gates each used to re-declare inline.
    */
  def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(go))
      f.delete(): Unit
    }
    go(new java.io.File(path))
  }
}
