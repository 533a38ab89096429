#!/bin/sh
# Build the native extension into randlapack_tpu/native/.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
NPINC=$(python -c "import numpy; print(numpy.get_include())")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
mkdir -p ../randlapack_tpu/native
g++ -O3 -std=c++17 -shared -fPIC \
    -I"$PYINC" -I"$NPINC" \
    fast_mm.cpp -o "../randlapack_tpu/native/_randlapack_native$EXT"
echo "built randlapack_tpu/native/_randlapack_native$EXT"
