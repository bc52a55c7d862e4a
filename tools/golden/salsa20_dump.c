/* Golden-vector generator: drives the reference's qhasm Salsa20 assembly
 * (nfl_crypto_stream_salsa20_amd64_xmm6.s) with fixed keys/nonces and dumps
 * keystream bytes for byte-exactness tests of our implementation. */
#include <stdio.h>
#include <stdint.h>
#include <string.h>

extern int nfl_crypto_stream_salsa20_amd64_xmm6(
    unsigned char *c, unsigned long long clen,
    const unsigned char *n, const unsigned char *k);

int main(void) {
    unsigned char key[32], nonce[8], out[1024];
    FILE *f = fopen("salsa20_golden.bin", "wb");
    /* case 1: key = 0..31, nonce = 0 */
    for (int i = 0; i < 32; i++) key[i] = (unsigned char)i;
    memset(nonce, 0, 8);
    nfl_crypto_stream_salsa20_amd64_xmm6(out, 1024, nonce, key);
    fwrite(out, 1, 1024, f);
    /* case 2: same key, nonce = 1 (fastrandombytes second call) */
    nonce[0] = 1;
    nfl_crypto_stream_salsa20_amd64_xmm6(out, 1024, nonce, key);
    fwrite(out, 1, 1024, f);
    /* case 3: key = 0xAA.., nonce = 0x0123456789ABCDEF little-endian */
    memset(key, 0xAA, 32);
    uint64_t n64 = 0x0123456789ABCDEFULL;
    for (int i = 0; i < 8; i++) nonce[i] = (n64 >> (8 * i)) & 0xff;
    nfl_crypto_stream_salsa20_amd64_xmm6(out, 777, nonce, key);
    fwrite(out, 1, 777, f);
    /* case 4: zero key, zero nonce (classic test vector) */
    memset(key, 0, 32); memset(nonce, 0, 8);
    nfl_crypto_stream_salsa20_amd64_xmm6(out, 64, nonce, key);
    fwrite(out, 1, 64, f);
    fclose(f);
    printf("wrote salsa20_golden.bin\n");
    return 0;
}
