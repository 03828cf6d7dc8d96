#!/bin/bash
# Regenerates the cross-parity golden matrix in tests/goldens/ from the
# oracle binary (tools/build_reference_oracle.sh must have run first):
# API-0 encodes over {bt709,p3,bt2100} x {HLG,PQ} on the reference's
# 1280x720 P010 fixture, each decoded to HDR_LINEAR (F16) and the
# matching RGBA1010102 format — the jpegr_test.cpp INSTANTIATE sweep's
# decode-side analog (reference tests/jpegr_test.cpp:2154-2157).
set -euo pipefail
ORACLE=${ORACLE:-/tmp/oracle/golden}
REF_DATA=${REF_DATA:-/root/reference/tests/data}
OUT=$(cd "$(dirname "$0")/../tests/goldens" && pwd)
P010="$REF_DATA/raw_p010_image.p010"
W=1280 H=720
cd "$(mktemp -d)"
for g in 0 1 2; do
  case $g in 0) gn=709;; 1) gn=p3;; 2) gn=2100;; esac
  for tf in 1 2; do
    case $tf in 1) tn=hlg; boost=4.926108; fmt1010102=3;;
                2) tn=pq;  boost=49.261084; fmt1010102=2;; esac
    enc="$OUT/enc0_${gn}_${tn}.jpegr"
    "$ORACLE" encode0 "$P010" $W $H $tf 95 "$enc" $g
    "$ORACLE" decode "$enc" dec_f16 1 $boost
    gzip -9 -c dec_f16.raw > "$OUT/dec0_${gn}_${tn}_f16.raw.gz"
    "$ORACLE" decode "$enc" dec_101 $fmt1010102 $boost
    gzip -9 -c dec_101.raw > "$OUT/dec0_${gn}_${tn}_1010102.raw.gz"
    echo "golden: ${gn}/${tn}"
  done
done
