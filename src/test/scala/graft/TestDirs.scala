package graft

import java.nio.file.{Files, Path}

/** Shared temp-dir helpers for specs — one definition so fixes (like the
  * stream-close on walk/list) land everywhere at once. */
object TestDirs {

  def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRec(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  def dirBytes(dir: String): Long = {
    val s = Files.walk(java.nio.file.Paths.get(dir))
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
    finally s.close()
  }
}
