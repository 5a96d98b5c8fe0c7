package lapis;

import com.github.luben.zstd.Zstd;
import com.github.luben.zstd.ZstdDecompressCtx;
import org.apache.spark.sql.api.java.UDF2;

/**
 * Dictionary-zstd decompression, mirroring the reference ingest codec
 * (/root/reference/src/silo/zstd/zstd_decompressor.cpp: getFrameContentSize
 * then decompress with a DDict built from the reference genome string).
 */
public class ZstdDictDecompress implements UDF2<byte[], byte[], String> {
  @Override
  public String call(byte[] data, byte[] dict) {
    if (data == null) {
      return null;
    }
    long size = Zstd.getFrameContentSize(data);
    if (size < 0 || size > Integer.MAX_VALUE) {
      throw new IllegalArgumentException(
          "zstd frame content size unknown or oversized (" + size + ")");
    }
    try (ZstdDecompressCtx ctx = new ZstdDecompressCtx()) {
      if (dict != null) {
        ctx.loadDict(dict);
      }
      byte[] out = ctx.decompress(data, (int) size);
      return new String(out, java.nio.charset.StandardCharsets.UTF_8);
    }
  }
}
