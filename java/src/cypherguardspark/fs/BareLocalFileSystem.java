package cypherguardspark.fs;

import java.io.File;
import java.io.FileNotFoundException;
import java.io.IOException;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem minus permission shell-outs.
 *
 * Without libhadoop native, Hadoop's local filesystem forks a /bin/chmod
 * per created file/directory (write path) and an `ls -ld` per permission
 * read (DeprecatedRawLocalFileStatus.loadPermissionInfo). In a
 * single-user container the permission bits are meaningless, while each
 * fork of a large-heap JVM costs ~milliseconds of kernel time; a
 * 256-partition parquet checkpoint was measured at ~1600 forks. This
 * subclass (a) turns setPermission into a no-op and (b) overrides
 * getFileStatus/listStatus to report a fixed 0644/0755 permission set from
 * plain java.io.File metadata, so neither path ever forks.
 */
public class BareLocalFileSystem extends RawLocalFileSystem {
  private static final FsPermission FILE_PERM =
      FsPermission.createImmutable((short) 0644);
  private static final FsPermission DIR_PERM =
      FsPermission.createImmutable((short) 0755);
  private static final String USER = System.getProperty("user.name", "spark");

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    // no-op: avoid fork+exec of chmod per file
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    File localf = pathToFile(f);
    if (!localf.exists()) {
      throw new FileNotFoundException("File " + f + " does not exist");
    }
    boolean isDir = localf.isDirectory();
    return new FileStatus(
        isDir ? 0 : localf.length(),
        isDir,
        1,
        getDefaultBlockSize(f),
        localf.lastModified(),
        localf.lastModified(),
        isDir ? DIR_PERM : FILE_PERM,
        USER,
        USER,
        f.makeQualified(getUri(), getWorkingDirectory()));
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    File localf = pathToFile(f);
    if (!localf.exists()) {
      throw new FileNotFoundException("File " + f + " does not exist");
    }
    if (localf.isFile()) {
      return new FileStatus[] {getFileStatus(f)};
    }
    String[] names = localf.list();
    if (names == null) {
      throw new IOException("Error listing files under " + f);
    }
    FileStatus[] results = new FileStatus[names.length];
    for (int i = 0; i < names.length; i++) {
      results[i] = getFileStatus(new Path(f, names[i]));
    }
    return results;
  }
}
