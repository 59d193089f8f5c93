#!/bin/bash
# Build the ACTUAL reference library (unmodified sources from
# /root/reference/source) + our benchmark harness, against the Eigen headers
# bundled with tensorflow and the fmt headers bundled with torch (the
# reference's own submodules are not checked out in this image).
set -euo pipefail
cd "$(dirname "$0")"

SITE=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
EIGEN="$SITE/tensorflow/include"
FMT="$SITE/torch/include"
OUT="${1:-/tmp/bench_reference}"

g++ -O3 -DNDEBUG -DEIGEN_NO_DEBUG -DFMT_HEADER_ONLY -std=c++17 \
  -I/root/reference/include -I"$EIGEN" -I"$FMT" \
  /root/reference/source/qp.cc \
  /root/reference/source/nonlinear.cc \
  /root/reference/source/residual.cc \
  /root/reference/source/structs.cc \
  bench_reference.cc \
  -o "$OUT"
echo "built $OUT"
