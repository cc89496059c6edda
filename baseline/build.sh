#!/bin/sh
# Build the C++ reference tool against the local libsais-API shim for
# byte-equality cross-checks. Sources are compiled from the read-only
# reference mount; nothing is copied into this repository.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$(readlink -f "$0")")
OUT=${1:-$HERE/cms-bwt-ref}
# -include unordered_map: the reference relies on a transitive include that
# newer libstdc++ no longer provides
g++ -O2 -std=c++20 -include unordered_map -I "$REF" -I "$HERE" \
    "$REF/main.cpp" "$REF/CMS-BWT-functions.cpp" "$HERE/libsais_shim.cpp" \
    -o "$OUT"
echo "built $OUT"
