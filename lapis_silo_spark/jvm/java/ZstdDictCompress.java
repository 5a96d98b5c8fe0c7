package lapis;

import com.github.luben.zstd.ZstdCompressCtx;
import org.apache.spark.sql.api.java.UDF2;

/**
 * Dictionary-zstd compression (the inverse of ZstdDictDecompress); used by
 * tests and by producers that want to emit reference-compatible
 * sequenceCompressed payloads (/root/reference/src/silo/zstd/zstd_compressor.cpp).
 */
public class ZstdDictCompress implements UDF2<String, byte[], byte[]> {
  @Override
  public byte[] call(String text, byte[] dict) {
    if (text == null) {
      return null;
    }
    try (ZstdCompressCtx ctx = new ZstdCompressCtx()) {
      ctx.setLevel(3);
      if (dict != null) {
        ctx.loadDict(dict);
      }
      return ctx.compress(text.getBytes(java.nio.charset.StandardCharsets.UTF_8));
    }
  }
}
