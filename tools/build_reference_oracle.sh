#!/bin/bash
# Builds a heif-free subset of the reference implementation
# (/root/reference) as a golden-parity oracle binary in /tmp/oracle.
# The reference sources are used in place; only a truncated copy of
# ultrahdr.cpp (sans the libheif-dependent converter half) is made in
# /tmp.  Nothing from the reference is copied into this repository.
set -euo pipefail
REF=${1:-/root/reference}
OUT=${2:-/tmp/oracle}
mkdir -p "$OUT"
sed -n 1,558p "$REF/lib/src/ultrahdr.cpp" \
  | grep -v '#include "ultrahdr/heifr.h"' \
  | grep -v '#include "libheif' > "$OUT/ultrahdr_core.cpp"
echo '}  // namespace ultrahdr' >> "$OUT/ultrahdr_core.cpp"
g++ -O2 -std=c++17 -I"$REF/lib/include" -I"$REF" \
  -I"$REF/third_party/image_io/includes" \
  -I"$REF/third_party/image_io/src/modp_b64" \
  -I"$REF/third_party/image_io/src/modp_b64/modp_b64" \
  "$(dirname "$0")/golden_main.cpp" "$OUT/ultrahdr_core.cpp" \
  "$REF"/lib/src/jpegr.cpp "$REF"/lib/src/gainmapmath.cpp \
  "$REF"/lib/src/jpegrutils.cpp "$REF"/lib/src/icc.cpp \
  "$REF"/lib/src/multipictureformat.cpp \
  "$REF"/lib/src/jpegencoderhelper.cpp "$REF"/lib/src/jpegdecoderhelper.cpp \
  "$REF"/third_party/image_io/src/base/*.cc \
  "$REF"/third_party/image_io/src/jpeg/*.cc \
  "$REF"/third_party/image_io/src/xml/*.cc \
  "$REF"/third_party/image_io/src/utils/*.cc \
  "$REF"/third_party/image_io/src/extras/*.cc \
  "$REF"/third_party/image_io/src/gcontainer/*.cc \
  "$REF"/third_party/image_io/src/modp_b64/*.cc \
  -ljpeg -lpthread -o "$OUT/golden" 2>/dev/null
echo "oracle built at $OUT/golden"
