package graft.core

/** Naming + liveness for per-session scratch directories.
  *
  * Scratch dirs (derived layouts, backup/index/stream sinks, bucketed
  * tables) are keyed per (process, session) so nothing from another JVM
  * is ever reused — but the age-based sweep in
  * [[graft.queries.Q.sweepStaleScratch]] needs to know whether the JVM
  * that OWNS a dir is still alive: mtime is written once at creation and
  * never refreshed by reads, so a long-lived sibling (server, shell,
  * >30-min bench) would otherwise have live dirs deleted out from under
  * it. The pid rides in the directory name (`p<pid>h<sessionHash>`), and
  * the sweep skips any name whose embedded pid is a running process.
  */
object Scratch {

  /** pid-stamped per-session tag for scratch dir / table names. */
  def tag(session: AnyRef): String =
    s"p${ProcessHandle.current.pid}h${System.identityHashCode(session)}"

  private val PidPattern = java.util.regex.Pattern.compile("p(\\d+)h\\d+")

  /** True when `name` embeds a [[tag]] whose pid is a live process —
    * the owner may still read the dir, so the sweep must leave it.
    * This process's own pid counts as live. Names without a tag (old
    * format, foreign dirs) return false and fall back to the age guard.
    */
  def ownerAlive(name: String): Boolean = {
    val m = PidPattern.matcher(name)
    m.find() && {
      try {
        val pid = m.group(1).toLong
        pid == ProcessHandle.current.pid ||
          ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
      } catch { case _: NumberFormatException => false }
    }
  }
}
