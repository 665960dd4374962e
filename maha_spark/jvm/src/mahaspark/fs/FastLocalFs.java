package mahaspark.fs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;

/**
 * {@code AbstractFileSystem} binding of {@link FastLocalFileSystem} for
 * the FileContext API (mirrors Hadoop's own {@code RawLocalFs}).
 *
 * <p>Structured Streaming's checkpoint manager prefers FileContext
 * ({@code FileContextBasedCheckpointFileManager}), whose default local
 * binding delegates to {@code RawLocalFileSystem} -- every checkpoint
 * metadata file (offsets, commits, state snapshots, sink log) pays the
 * same fork+exec chmod this package exists to remove. Bind with
 * {@code fs.AbstractFileSystem.file.impl=mahaspark.fs.FastLocalFs}.
 */
public class FastLocalFs extends DelegateToFileSystem {
  FastLocalFs(final URI theUri, final Configuration conf)
      throws IOException, URISyntaxException {
    super(theUri, new FastLocalFileSystem(), conf, "file", false);
  }
}
