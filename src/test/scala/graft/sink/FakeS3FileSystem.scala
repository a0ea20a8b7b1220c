package graft.sink

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.file.{Files, StandardCopyOption}

import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-process S3-SEMANTICS FileSystem — the default-environment stand-in
  * for `ObjectStoreLiveSpec`'s MinIO endpoint, modeling the object-store
  * behaviors the seal claim's correctness argument actually rests on
  * (reference: gads-etl `tests/integration/test_raw_sink_object_minio.py`
  * runs these against real MinIO in its CI; this fake makes the same
  * suite execute in an offline build):
  *
  *  - **Whole-object PUT visibility**: `create()` buffers ALL bytes in
  *    memory; the object materializes only at `close()`. A writer that
  *    dies mid-write leaves NOTHING — no partial-seal hazard, which is
  *    precisely why the seal writer needs no tmp object on this scheme.
  *  - **Conditional PUT (If-None-Match: *)**: with `overwrite = false`
  *    the existence check happens AT CLOSE, atomically (hard-link
  *    publish), not at create — so two racing writers BOTH pass the
  *    open, both upload, and exactly one close wins, exactly like S3's
  *    conditional-write protocol. The loser sees
  *    [[FileAlreadyExistsException]] from close.
  *  - **Non-atomic rename**: copy + delete, and a file-level rename onto
  *    an existing destination is rejected — the reason the seal claim
  *    cannot use the tmp+rename strategy on this storage class.
  *  - **No appends** (S3 objects are immutable).
  *  - **Strong list-after-write consistency** (S3 since 2020): an object
  *    visible to `close()` is immediately visible to list/get — the
  *    inherited local listing provides exactly that.
  *
  * Byte storage is local disk (scheme-stripped paths, same pattern as
  * [[FakeObjectStoreFs]]), so Spark's committers, JSONL readers, and
  * the manifest machinery run unmodified against `s3a:` URIs.
  */
class FakeS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream = bufferedPut(f, overwrite)

  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream = bufferedPut(f, overwrite)

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException(s"append not supported on an object store: $f")

  // S3 objects carry no POSIX permissions; materialize a fixed
  // permission instead of RawLocal's lazy loader (which re-resolves the
  // status path as a file: URI and chokes on the s3a scheme).
  private def sanitize(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "fake", "fake", st.getPath)

  override def getFileStatus(f: Path): FileStatus = sanitize(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(sanitize)

  /** Copy + delete; destination file must not already exist. */
  override def rename(src: Path, dst: Path): Boolean = {
    val d = pathToFile(dst)
    if (d.isFile) return false
    if (!pathToFile(src).exists()) return false
    FileUtil.copy(this, src, this, dst, true, getConf)
  }

  private def bufferedPut(f: Path, overwrite: Boolean): FSDataOutputStream = {
    val target = pathToFile(f)
    val buf = new ByteArrayOutputStream()
    val put: OutputStream = new OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        val parent = target.getParentFile
        if (parent != null) parent.mkdirs() // prefixes always "exist" on S3
        val tmp = Files.createTempFile(parent.toPath, ".upload-", null)
        Files.write(tmp, buf.toByteArray)
        try {
          if (overwrite) {
            Files.move(tmp, target.toPath,
              StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
          } else {
            try Files.createLink(target.toPath, tmp) // atomic exclusive claim
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new FileAlreadyExistsException(
                  s"PUT If-None-Match lost: object already exists: $f")
            }
          }
        } finally Files.deleteIfExists(tmp)
      }
    }
    new FSDataOutputStream(put, statistics)
  }
}
