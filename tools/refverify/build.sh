#!/bin/bash
# Build the REFERENCE extractor as a verification oracle (not shipped code).
# Compiles /root/reference sources against local shims:
#  - boost/optional.hpp, boost/locale/encoding.hpp: minimal header shims
#    (std-free optional with reference support; to_utf via glibc iconv)
#  - decrypt3_patch.py: adapts decrypt.cc's OpenSSL-1.0 EVP calls to
#    OpenSSL 3 (heap CTX + legacy provider for RC4)
set -e
BUILD=${1:-/tmp/refbuild}
mkdir -p "$BUILD"
cp /root/reference/*.cc /root/reference/*.h "$BUILD/"
cp -r "$(dirname "$0")/boost" "$BUILD/"
cp "$(dirname "$0")/main_ref.cc" "$BUILD/"
python3 "$(dirname "$0")/decrypt3_patch.py" "$BUILD"
cd "$BUILD"
rm -f decrypt.cc # replaced by decrypt3.cc
g++ -std=c++17 -O2 -I. -Wno-deprecated-declarations -c *.cc
g++ -std=c++17 -O2 *.o -o ref_extract -lz -lcrypto
echo "built: $BUILD/ref_extract  (usage: ref_extract file.pdf > text)"
