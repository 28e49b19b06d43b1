#!/bin/sh
# Build the reference vstree binaries (mkvtree.x / vmatch.x / vmatchselect.x /
# chain2dim.x / matchcluster.x + aux tools) into the gitignored scratch dir
# /root/repo/.ref-build so the differential test suite (SURVEY.md §4) can run.
#
# The reference tree at /root/reference is read-only, so we copy src/ out,
# patch three build-environment issues (none touch algorithm code):
#   1. bzlib.h is not installed; write a minimal prototype header and link
#      the system libbz2.so.1.0 via a shim symlink.
#   2. LDLIBS references a genometools static lib that does not exist here;
#      link system -lz/-lbz2 instead.
#   3. Three pre-generated prototype files (include/{bestmatch,binsearch,
#      applall}.pr) are empty in the shipped tree; regenerate them with a
#      small skproto-equivalent.
set -e

REF=/root/reference/src
BUILD=/root/repo/.ref-build

if [ -x "$BUILD/src/Vmatch/vmatch.x" ]; then
  echo "reference binaries already built at $BUILD/src"
  exit 0
fi

rm -rf "$BUILD"
mkdir -p "$BUILD/shimlib"
cp -r "$REF" "$BUILD/src"
ln -sf /lib/x86_64-linux-gnu/libbz2.so.1.0 "$BUILD/shimlib/libbz2.so"
ln -sf /lib/x86_64-linux-gnu/libz.so "$BUILD/shimlib/libz.so"

cd "$BUILD/src"

cat > include/bzlib.h <<'EOF'
/* Minimal bzlib.h for linking against system libbz2.so.1.0 (oracle build only). */
#ifndef _BZLIB_H
#define _BZLIB_H
typedef void BZFILE;
BZFILE *BZ2_bzopen(const char *path, const char *mode);
void BZ2_bzclose(BZFILE *b);
int BZ2_bzread(BZFILE *b, void *buf, int len);
int BZ2_bzwrite(BZFILE *b, void *buf, int len);
int BZ2_bzflush(BZFILE *b);
#endif
EOF

sed -i 's|^DEFINELDLIBS=-lm -ldl -lpthread.*|DEFINELDLIBS=-L'"$BUILD"'/shimlib -lz -lbz2 -lm -ldl -lpthread|' Makedef
grep -rln 'libgenometools.a' --include=Makefile . | while read -r f; do
  sed -i 's|LDLIBS = ${CURDIR}/../../../genometools/lib/libgenometools.a \\|LDLIBS = \\|' "$f"
done

cat > /tmp/skproto.py <<'EOF'
import re, sys
src = open(sys.argv[1]).read()
src = re.sub(r'/\*.*?\*/', '', src, flags=re.S)
out = ["#ifdef __cplusplus", 'extern "C" {', "#endif"]
for m in re.finditer(r'(?m)^([A-Za-z_][A-Za-z0-9_ \t\*\n,\(\)\[\]]*?\))\s*\n?\{', src):
    sig = m.group(1)
    if re.match(r'\s*static', sig):
        continue
    if '=' in sig.split('(')[0]:
        continue
    name = sig.split('(')[0].strip().split()[-1].lstrip('*')
    if name in ('if', 'for', 'while', 'switch', 'main'):
        continue
    out.append(sig + ";\n")
out += ["#ifdef __cplusplus", "}", "#endif"]
print("\n".join(out))
EOF
for f in bestmatch binsearch applall; do
  python3 /tmp/skproto.py kurtz/$f.c > include/$f.pr
done
find . -name '*.pr' -exec touch {} +

WORKVSTREESRC="$BUILD/src" make -j"$(nproc)" 64bit=yes
echo "built: $BUILD/src/Vmatch/vmatch.x"
