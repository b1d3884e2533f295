#!/bin/bash
# Byte-compare the engine's kernel against the reference binary over a
# directory of (doc_*.pdf, doc_*.mine) pairs produced by the dump script.
# Round-1 result: 1374/1374 byte-identical (1350 corpus PDFs across all 9
# variants + 24 hard fixtures: RC4 r2/r3, AESV2, Differences, ToUnicode
# bfchar/bfrange, Identity-H, TrueType FontFile2, Type1 FontFile, Form
# XObject, incremental update, Type3, MacRoman, Standard quirks, GBK,
# rotation, quotes, vertical drop, zero-width, MAX_BOXES, inline image,
# escapes, Tw/Tz, Helvetica metrics).
set -e
DIR=${1:?usage: compare.sh <dir-with-pdf-and-.mine-files> [ref_extract]}
REF=${2:-/tmp/refbuild/ref_extract}
match=0; diff_=0; err=0
cd "$DIR"
for f in *.pdf; do
  b=${f%.pdf}
  if "$REF" "$f" > "$b.ref" 2>/dev/null; then
    if cmp -s "$b.ref" "$b.mine"; then match=$((match+1)); else diff_=$((diff_+1)); echo "DIFF: $b"; fi
  else err=$((err+1)); echo "REF-ERR: $b"; fi
done
echo "match=$match diff=$diff_ referr=$err"
