package sparkgraft;

import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.KeyAccessDeniedException;
import org.apache.parquet.crypto.keytools.KmsClient;

/** Minimal local KMS for tests: master keys come from the
 *  parquet.encryption.key.list conf (id:base64), and key-encryption is
 *  a reversible XOR wrap - the KMS only transports the KEK; parquet
 *  itself does the real AES-GCM data encryption. */
public class LocalWrapKMS implements KmsClient {
  private final Map<String, byte[]> masterKeys = new HashMap<>();

  @Override
  public void initialize(Configuration conf, String id, String url, String token)
      throws KeyAccessDeniedException {
    String[] list = conf.getTrimmedStrings("parquet.encryption.key.list");
    for (String e : list) {
      String[] kv = e.split(":", 2);
      if (kv.length != 2) {
        throw new KeyAccessDeniedException("malformed key.list entry (want id:base64): " + e);
      }
      masterKeys.put(kv[0], Base64.getDecoder().decode(kv[1]));
    }
  }

  private byte[] xorWith(byte[] in, String masterId) throws KeyAccessDeniedException {
    byte[] m = masterKeys.get(masterId);
    if (m == null) throw new KeyAccessDeniedException("no master key: " + masterId);
    byte[] out = new byte[in.length];
    for (int i = 0; i < in.length; i++) out[i] = (byte) (in[i] ^ m[i % m.length]);
    return out;
  }

  @Override
  public String wrapKey(byte[] key, String masterId) throws KeyAccessDeniedException {
    return Base64.getEncoder().encodeToString(xorWith(key, masterId));
  }

  @Override
  public byte[] unwrapKey(String wrapped, String masterId) throws KeyAccessDeniedException {
    return xorWith(Base64.getDecoder().decode(wrapped), masterId);
  }
}
