package graft.obs

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

/** Size-rotated append-only log file — the reference's
  * `RotatingFileHandler("./logs/project.log", maxBytes=5_000_000,
  * backupCount=2)` (`pipeline/utils/logs.py:45-50`), pure JVM. When the
  * base file would exceed `maxBytes`, backups shift
  * (`.1` → `.2`, base → `.1`, oldest beyond `backupCount` dropped) and
  * the base starts fresh — Python `logging`'s rollover contract.
  * `freshStart` also deletes an existing base file first, the
  * reference's always-fresh-per-run behavior (`logs.py:43-44`).
  *
  * Thread-safe via a single lock: callers are the status thread (≤1 Hz)
  * and occasional log records — never a per-row path.
  */
final class RollingLog(base: Path, maxBytes: Long, backupCount: Int) {
  Option(base.getParent).foreach(Files.createDirectories(_))

  private def backup(i: Int): Path =
    base.resolveSibling(base.getFileName.toString + "." + i)

  private def rollover(): Unit = {
    Files.deleteIfExists(backup(backupCount))
    var i = backupCount - 1
    while (i >= 1) {
      if (Files.exists(backup(i)))
        Files.move(backup(i), backup(i + 1))
      i -= 1
    }
    if (backupCount >= 1 && Files.exists(base)) Files.move(base, backup(1))
    else Files.deleteIfExists(base)
  }

  def append(line: String): Unit = synchronized {
    val bytes = (line + "\n").getBytes(UTF_8)
    if (Files.exists(base) && Files.size(base) + bytes.length > maxBytes &&
      Files.size(base) > 0) rollover()
    Files.write(base, bytes, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

object RollingLog {
  /** Fresh-per-run log at the reference's defaults (`logs.py:43-50`):
    * delete any existing base file, 5 MB rollover, 2 backups. */
  def freshStart(base: Path, maxBytes: Long = 5000000L, backupCount: Int = 2): RollingLog = {
    Option(base.getParent).foreach(Files.createDirectories(_))
    Files.deleteIfExists(base)
    new RollingLog(base, maxBytes, backupCount)
  }
}
