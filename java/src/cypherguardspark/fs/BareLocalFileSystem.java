package cypherguardspark.fs;

import java.io.IOException;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem minus permission shell-outs.
 *
 * Without libhadoop native, Hadoop's local filesystem forks a /bin/chmod
 * per created file/directory (and `ls -ld` to read permissions). In a
 * single-user container the permission bits are meaningless, while each
 * fork of a large-heap JVM costs ~milliseconds of kernel time; a
 * 256-partition parquet checkpoint was measured at ~1600 forks. This
 * subclass turns setPermission into a no-op and reports a fixed 0644/0755
 * permission set without shelling out.
 */
public class BareLocalFileSystem extends RawLocalFileSystem {
  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    // no-op: avoid fork+exec of chmod per file
  }
}
