# patch decrypt.cc for OpenSSL 3 (verification build only):
#  - EVP_CIPHER_CTX stack alloc -> heap (struct is opaque now)
#  - load the legacy provider so EVP_rc4 works
import sys
build = sys.argv[1] if len(sys.argv) > 1 else '/tmp/refbuild'
src = open(build + '/decrypt.cc').read()
src = src.replace('#include <openssl/evp.h>',
 '#include <openssl/evp.h>\n#include <openssl/provider.h>\n'
 'static const bool _legacy_loaded = [](){ OSSL_PROVIDER_load(NULL, "legacy"); OSSL_PROVIDER_load(NULL, "default"); return true; }();')
src = src.replace('''        EVP_CIPHER_CTX rc4;
        EVP_CIPHER_CTX_init(&rc4);
        unique_ptr<EVP_CIPHER_CTX, int (*)(EVP_CIPHER_CTX*)>  rc4_scope(&rc4, EVP_CIPHER_CTX_cleanup);''',
'''        EVP_CIPHER_CTX *rc4p = EVP_CIPHER_CTX_new();
        EVP_CIPHER_CTX &rc4 = *rc4p;
        unique_ptr<EVP_CIPHER_CTX, void (*)(EVP_CIPHER_CTX*)>  rc4_scope(rc4p, EVP_CIPHER_CTX_free);''')
src = src.replace('''        EVP_CIPHER_CTX aes;
        EVP_CIPHER_CTX_init(&aes);
        unique_ptr<EVP_CIPHER_CTX, int (*)(EVP_CIPHER_CTX*)>  aes_scope(&aes, EVP_CIPHER_CTX_cleanup);''',
'''        EVP_CIPHER_CTX *aesp = EVP_CIPHER_CTX_new();
        EVP_CIPHER_CTX &aes = *aesp;
        unique_ptr<EVP_CIPHER_CTX, void (*)(EVP_CIPHER_CTX*)>  aes_scope(aesp, EVP_CIPHER_CTX_free);''')
open(build + '/decrypt3.cc','w').write(src)
print('patched')
