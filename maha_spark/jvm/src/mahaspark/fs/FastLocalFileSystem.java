package mahaspark.fs;

import java.io.IOException;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * Local {@code file://} FileSystem for single-user dev/bench hosts.
 *
 * <p>Hadoop's default local filesystem stack costs two process spawns and
 * one extra file per created file: {@code LocalFileSystem} (a
 * {@code ChecksumFileSystem}) writes a {@code .crc} sidecar beside every
 * file, and {@code RawLocalFileSystem.setPermission} shells out
 * ({@code fork}+{@code exec} of {@code chmod}) for every create and mkdir
 * when the libhadoop native library is absent -- which it always is in a
 * pip-installed PySpark. On hosts where process spawn is expensive
 * (containers/sandboxes with process supervision measure 50-100 ms per
 * exec), a dynamic-partition write of a few thousand files turns into
 * minutes of serialized chmod execs; Structured Streaming checkpoints pay
 * the same tax per metadata file.
 *
 * <p>This subclass (a) skips the checksum layer entirely by extending
 * {@code RawLocalFileSystem} directly, and (b) turns
 * {@code setPermission} into a no-op: files keep the permissions the
 * process umask gives them, which is exactly right for a single-user
 * local filesystem. Durability and rename semantics are unchanged. On a
 * real cluster (HDFS / S3A / ABFS) this class is never instantiated --
 * it is bound only to the {@code file} scheme.
 */
public class FastLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission)
      throws IOException {
    // no-op: umask-derived permissions are already correct locally, and
    // the fork+exec chmod fallback is the single most expensive file
    // operation on supervised sandboxes (measured ~85 ms per exec).
  }
}
