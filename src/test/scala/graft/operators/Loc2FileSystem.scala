package graft.operators

/** A local-disk filesystem under a SECOND scheme (`loc2:`), so tests can
  * exercise genuinely cross-filesystem code paths (`getUri` differs from
  * the default `file:///`) without a real remote store. Paths map 1:1 to
  * local paths — `loc2:/tmp/x` is `/tmp/x` on disk.
  */
class Loc2FileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("loc2:///")
}
