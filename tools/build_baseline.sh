#!/usr/bin/env bash
# Build the REFERENCE stack into .baseline/ for interop tests and the
# end-to-end race: real jellyfish 2.3.0 (+ its Python SWIG binding) and the
# JASPER 1.0.3 release scripts, both from the tarballs bundled in the
# reference repo (reference Makefile.am:24 ships jellyfish-2.3.0.tar.gz).
#
# Produces:
#   .baseline/install/bin/jellyfish     the real counting/query binary
#   .baseline/pysite/dna_jellyfish*     the real SWIG python module
#   .baseline/jasper/                   reference jasper.sh / jasper.py
#
# Usage: tools/build_baseline.sh [-j N]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REF:-/root/reference}"
BASE="$REPO/.baseline"
JOBS="${2:-$(nproc)}"

mkdir -p "$BASE"
cd "$BASE"

if [ ! -x "$BASE/install/bin/jellyfish" ]; then
  rm -rf jellyfish-2.3.0
  tar xf "$REF/jellyfish-2.3.0.tar.gz"
  cd jellyfish-2.3.0
  # the image exports PYTHON_VERSION=3.12.12 which makes configure look for
  # a binary literally named python3.12.12; override with the real suffix
  PYVER="$(python3 -c 'import sys; print("%d.%d" % sys.version_info[:2])')"
  PYTHON_VERSION="$PYVER" ./configure --prefix="$BASE/install" \
      --enable-python-binding >configure.log 2>&1 \
    || PYTHON_VERSION= ./configure --prefix="$BASE/install" >configure.log 2>&1
  make -j"$JOBS" >make.log 2>&1
  make install >install.log 2>&1
  cd "$BASE"
fi

# the SWIG python module: wrapper .py + native .so into one site dir
mkdir -p "$BASE/pysite"
found=$(find "$BASE/install" "$BASE/jellyfish-2.3.0/swig" \
        \( -name 'dna_jellyfish.py' -o -name '_dna_jellyfish*' \) 2>/dev/null)
for f in $found; do
  cp -f "$f" "$BASE/pysite/" 2>/dev/null || true
done

if [ ! -d "$BASE/jasper" ]; then
  tar xf "$REF/jasper-1.0.3.tar.gz"
  mv jasper-* jasper
fi

echo "baseline ready:"
ls "$BASE/install/bin/jellyfish" 2>/dev/null || echo "  !! jellyfish binary missing"
ls "$BASE/pysite/" 2>/dev/null || true
ls "$BASE/jasper/src/jasper.sh" 2>/dev/null || echo "  !! jasper scripts missing"
