package graft.tools

/** A REAL second process contending for a DurableState maintenance
  * lease — spawned by DurableStateSpec's two-process test, so the
  * create-exclusive / stale-steal paths are exercised across an
  * actual process boundary instead of a simulated in-JVM rival.
  *
  * args: `<tableDir> <ageMs>` — atomically create-exclusive the
  * lease file with `sinceMs = now − ageMs` (a positive age plants an
  * already-stale lease, as a crashed holder would leave). Prints
  * `HELD <holder>` and exits 0, or `BUSY <current content>` and
  * exits 2 when another holder's file exists — exactly the loud
  * contention the file protocol promises. Plain `java.nio` on
  * purpose: `Files.createFile` IS the local-FS atomic
  * create-exclusive primitive the lease stands on, and a raw file
  * (no Hadoop .crc sibling) is what a non-Spark maintainer would
  * leave — the main JVM must read, age-check, and steal it anyway.
  */
object LeaseRival {
  def main(args: Array[String]): Unit = args match {
    // `<dir> fence <token>`: a NEWER maintainer in another process
    // bumps the FILE half of the fence (it has no access to our
    // catalog — that is the point); the main JVM's next fenced write
    // must abort. The Hadoop-written file carries a .crc sibling
    // that a raw overwrite would orphan (ChecksumException on the
    // next read) — delete it, as any non-Hadoop writer must.
    case Array(dir, "fence", token) =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "._fence.txt.crc"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_fence.txt"),
        s"token=$token\n".getBytes("UTF-8"))
      println(s"FENCED $token")
    case Array(dir, ageMs) =>
      val lp = java.nio.file.Paths.get(dir, "_lease.txt")
      val holder = "rival-proc-" + ProcessHandle.current().pid()
      val since = System.currentTimeMillis() - ageMs.toLong
      try {
        java.nio.file.Files.createFile(lp)
        java.nio.file.Files.write(lp,
          s"holder=$holder\nsinceMs=$since\n".getBytes("UTF-8"))
        println(s"HELD $holder")
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val cur = new String(
            java.nio.file.Files.readAllBytes(lp), "UTF-8")
          println("BUSY " + cur.linesIterator.mkString(";"))
          sys.exit(2)
      }
    case other =>
      sys.error(s"LeaseRival: bad args ${other.mkString(" ")}")
  }
}
