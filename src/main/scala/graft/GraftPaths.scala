package graft

/** Root for every on-disk sink artifact the engine writes (ORC round
  * trips, training shards, compaction / z-order layouts). One shared
  * constant so relocating the repo — or isolating concurrent sessions
  * that bench the same sf basename — is a single
  * `-Dgraft.sink.root=/path` override instead of six hardcoded
  * absolute paths. Default: `<cwd>/target` (the sbt build dir),
  * resolved once at class load. */
object GraftPaths {
  val SinkRoot: String =
    sys.props.getOrElse("graft.sink.root", new java.io.File("target").getAbsolutePath)

  /** `<root>/<kind>/<tag>` — the layout every sink follows. */
  def sink(kind: String, tag: String): String = s"$SinkRoot/$kind/$tag"
}
