package graft.cli

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test stand-in for a remote object store: a `fake://` scheme backed
  * by the local filesystem. Unreadable unless a `connection` block
  * installs `fs.fake.impl` into the session Hadoop conf — the same
  * dependency chain an `s3a://` source has on its credentials.
  */
class FakeRemoteFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("fake:///")
}
