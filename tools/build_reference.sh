#!/bin/sh
# Build the reference C codec (the executable spec) out-of-tree.
# Sources are copied to a scratch dir so /root/reference stays untouched.
# -ffp-contract=off keeps f32 arithmetic strict IEEE (no FMA contraction),
# matching the engine's bit-exact mode; the Makefile exposes EXTRA_CFLAGS.
set -e
SRC="${REFERENCE_DIR:-/root/reference}"
DST="${REF_BUILD_DIR:-/tmp/jpeg_ref_build}"
mkdir -p "$DST"
cp "$SRC"/*.c "$SRC"/*.h "$SRC"/Makefile "$DST"/
make -C "$DST" EXTRA_CFLAGS="-ffp-contract=off" -s
echo "$DST"
